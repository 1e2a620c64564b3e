package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.TextAnalysis

/** Randomized corpora through the PassJoin pigeonhole blocking
  * (`TextAnalysis.editDistanceCandidates`): over random low-alphabet
  * strings — where edit-distance structure is dense and adversarial,
  * unlike fixture part names — the candidate set must contain EVERY
  * unordered pair within Levenshtein distance ≤ 2 (completeness: the
  * blocking is a filter, never a loss), and every emitted candidate must
  * be a genuine pair of distinct input names (no fabrication). A tight
  * alphabet of {a,b} plus short lengths maximizes boundary collisions:
  * segment geometry off-by-ones that a natural corpus would never
  * exercise fail here within a few trials.
  */
object EditDistProps extends Properties("EditDistCandidates") {

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

  // names of length >= 3 (the K+1 segment contract) over a 2-letter
  // alphabet: dense near-dup structure, every geometry boundary hit
  private val nameGen: Gen[String] =
    Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))

  private val corpusGen: Gen[Set[String]] =
    Gen.chooseNum(5, 30).flatMap(n => Gen.listOfN(n, nameGen).map(_.toSet))

  property("complete and sound over random tight-alphabet corpora") =
    Prop.forAll(corpusGen) { names0 =>
      val names = names0.toSeq.sorted
      val truth = (for {
        i <- names.indices; j <- (i + 1) until names.length
        if lev(names(i), names(j)) <= 2
      } yield (names(i), names(j))).toSet
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(names.map(Row(_)), 2),
        StructType(Seq(StructField("name", StringType))))
      val cands = TextAnalysis.editDistanceCandidates(df)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val missed = truth -- cands
      val fabricated = cands.filter { case (a, b) =>
        a >= b || !names.contains(a) || !names.contains(b)
      }
      Prop(missed.isEmpty) :| s"missed true pairs: ${missed.take(5)}" &&
        Prop(fabricated.isEmpty) :| s"bad candidates: ${fabricated.take(5)}"
    }
}
