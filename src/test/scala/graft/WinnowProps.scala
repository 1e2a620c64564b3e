package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized corpora through the winnowing pipeline: the distributed
  * candidate pairs must equal a plain-JVM recompute over the same
  * fingerprint definition (hash28Jvm ≡ the SQL/Column md5 family per
  * PortableProps), and the Schleimer–Wilkerson–Aiken guarantee — docs
  * sharing an exact ≥ w+k−1-char substring share a fingerprint — must
  * hold wherever the planted run survives the hot cap. Random text, not
  * fixture text, so tokenization luck cannot hide a window-boundary bug.
  */
object WinnowProps extends Properties("Winnow") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private lazy val spark = SparkTestSession.spark

  private val K = 16; private val W = 25; private val HotCap = 16

  private def jvmFps(text: String): Set[Long] =
    if (text.length < K + W - 1) Set.empty
    else {
      val hs = (0 to text.length - K)
        .map(i => functions.Portable.hash28Jvm(text.substring(i, i + K)))
      hs.sliding(W).map(_.min).toSet
    }

  private val lowerWord: Gen[String] =
    Gen.chooseNum(3, 9).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val docGen: Gen[String] =
    Gen.chooseNum(15, 60).flatMap(n =>
      Gen.listOfN(n, lowerWord).map(_.mkString(" ")))

  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(6, 18).flatMap(n => Gen.listOfN(n, docGen))

  property("distributed pairs equal the plain-JVM recompute") =
    Prop.forAll(corpusGen) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = operators.Dedup
        .winnowPairs(docs.toDF("doc_id", "text"), 1).collect()
        .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
          r.getAs[Long]("n_shared"))).toMap
      val all = docs.map { case (id, t) => id -> jvmFps(t) }
      val postings = all.flatMap { case (id, f) => f.map(_ -> id) }
        .groupBy(_._1).map { case (fp, xs) => fp -> xs.map(_._2).toSet }
      val hot = postings.filter(_._2.size >= HotCap).keySet
      val want = (for {
        (a, fa) <- all; (b, fb) <- all if a < b
        shared = ((fa & fb) -- hot).size.toLong if shared >= 1
      } yield (a, b) -> shared).toMap
      Prop(got == want) :| s"got=${got.size} want=${want.size}"
    }

  property("guarantee: a planted 40-char shared run yields a shared fingerprint") =
    Prop.forAll(docGen, docGen, docGen) { (a, b, run0) =>
      import spark.implicits._
      // plant the same >= (W + K - 1)-char run into two otherwise random docs
      val run = (run0 + " " + run0 + " " + run0).take(K + W - 1 + 10)
      val d1 = a + " " + run + " " + a.reverse
      val d2 = b.reverse + " " + run + " " + b
      val shared = jvmFps(d1) & jvmFps(d2)
      val out = operators.Dedup.winnowPairs(
        Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"), 1).collect()
      // the JVM twin must agree with the guarantee...
      val guarantee = shared.nonEmpty
      // ...and the distributed pipeline must surface the pair exactly when
      // the shared-fingerprint set is non-empty (2 docs: cap cannot bite)
      Prop(guarantee && (out.length == 1) &&
        out.head.getAs[Long]("n_shared") == shared.size.toLong) :|
        s"shared=${shared.size} rows=${out.length}"
    }
}
