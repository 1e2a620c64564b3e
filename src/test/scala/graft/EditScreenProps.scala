package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.TextAnalysis

/** Randomized corpora through the SERVING path of the edit-distance
  * family (`editScreenBatch` over a segment index): where `EditDistProps`
  * pins the symmetric candidate join, this suite pins the directed
  * probe-vs-history screen — every probe within Levenshtein ≤ 2 of some
  * indexed name must surface with the EXACT brute-force
  * (n_matches, best_dist), including distance-0 exact dups through the
  * same block path, and every no-match probe must surface with the
  * (0, -1, false) sentinels (totality). The same tight {a,b} alphabet
  * maximizes segment-geometry boundary collisions.
  */
object EditScreenProps extends Properties("EditScreen") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkTestSession.spark

  private def lev(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    val d = Array.tabulate(m + 1)(i => i)
    for (j <- 1 to n) {
      var prev = d(0); d(0) = j
      for (i <- 1 to m) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(m)
  }

  private val nameGen: Gen[String] =
    Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))

  private val caseGen: Gen[(Set[String], Set[String])] = for {
    nc <- Gen.chooseNum(5, 25)
    corpus <- Gen.listOfN(nc, nameGen).map(_.toSet)
    np <- Gen.chooseNum(3, 12)
    probes <- Gen.listOfN(np, nameGen).map(_.toSet)
  } yield (corpus, probes)

  property("screen verdicts equal brute force over random corpora and probes") =
    Prop.forAll(caseGen) { case (corpus0, probes0) =>
      val corpus = corpus0.toSeq.sorted
      val probes = probes0.toSeq.sorted.zipWithIndex
        .map { case (nm, i) => (i.toLong, nm) }
      val segIndex = TextAnalysis.editSegmentsBuild(spark.createDataFrame(
        spark.sparkContext.parallelize(corpus.map(Row(_)), 2),
        StructType(Seq(StructField("name", StringType)))))
      val batch = spark.createDataFrame(
        spark.sparkContext.parallelize(probes.map { case (k, nm) => Row(k, nm) }, 2),
        StructType(Seq(StructField("key", LongType), StructField("name", StringType))))
      val got = TextAnalysis.editScreenBatch(batch, segIndex).collect()
        .map(r => r.getAs[Long]("key") ->
          ((r.getAs[Long]("n_matches"), r.getAs[Int]("best_dist"),
            r.getAs[Boolean]("suspect")))).toMap
      val want = probes.map { case (k, nm) =>
        val dists = corpus.map(c => lev(nm, c)).filter(_ <= 2)
        k -> (if (dists.isEmpty) ((0L, -1, false))
              else ((dists.size.toLong, dists.min, true)))
      }.toMap
      Prop(got.size == probes.size) :| s"totality: ${got.size} of ${probes.size}" &&
        Prop(got == want) :|
          s"diff: ${(want.toSet -- got.toSet).take(3)} got ${(got.toSet -- want.toSet).take(3)}"
    }
}
