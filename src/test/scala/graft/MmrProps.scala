package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import org.apache.spark.sql.functions._

/** Randomized embedding corpora through the MMR selection: the
  * distributed unrolled 3-step selection must equal a plain-Scala MMR
  * recompute over the same 4-dp-rounded cosines — random vectors, so
  * fixture geometry cannot hide a tie-handling or coefficient
  * divergence (the review pass found exactly one: 1 − 0.7 is a
  * different double than the literal 0.3).
  */
object MmrProps extends Properties("Mmr") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private lazy val spark = SparkTestSession.spark

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.indices.map(i => a(i) * b(i)).sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  // small dimension + coarse coordinates make 4-dp cosine TIES likely —
  // the regime where tie-break rules matter
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(4, Gen.chooseNum(-2, 2).map(_.toFloat))
      .map(_.toArray).suchThat(v => v.exists(_ != 0f))

  private val corpusGen: Gen[List[Array[Float]]] =
    Gen.chooseNum(12, 30).flatMap(n => Gen.listOfN(n, vecGen))

  property("distributed MMR equals the plain-Scala recompute") =
    Prop.forAll(corpusGen) { vs0 =>
      import spark.implicits._
      // ids multiplied by 100 would make everything a probe; use ids where
      // exactly one (id 0... ) is a probe: keep natural ids, probes = %100==0
      val vecs = vs0.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = vecs.map { case (id, v) => (id, v.toSeq) }
        .toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
      val got = graft.operators.Similarity.annMmrTopkFrame(df).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("pick"),
          r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (q, xs) =>
          q -> xs.sortBy(_._2).map(_._3).toList
        }
      // brute force
      val dv = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
      val probes = vecs.map(_._1).filter(_ % 100 == 0)
      val want = probes.map { qid =>
        val q = dv(qid)
        val cands = dv.toSeq.filter(_._1 != qid)
          .map { case (id, v) => (id, round4(cos(q, v))) }
          .sortBy { case (id, c) => (-c, id) }.take(8)
        var chosen = List.empty[Long]
        for (_ <- 1 to 3) {
          if (cands.count(c => !chosen.contains(c._1)) > 0) {
            val best = cands.filterNot(c => chosen.contains(c._1)).map {
              case (id, rel) =>
                val pen = chosen.map(s => round4(cos(dv(id), dv(s)))) match {
                  case Nil => 0.0
                  case xs => xs.max
                }
                (id, if (chosen.isEmpty) rel else 0.7 * rel - 0.3 * pen)
            }.minBy { case (id, sc) => (-sc, id) }
            chosen = chosen :+ best._1
          }
        }
        qid -> chosen
      }.toMap
      Prop(got == want) :| s"got=$got want=$want"
    }
}
