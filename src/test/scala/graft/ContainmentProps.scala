package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import org.apache.spark.sql.functions._

/** Randomized gram corpora through the prefix-filtered containment join:
  * the directed prefix + positional candidate stage (r17) must be
  * LOSSLESS — the emitted pairs and both 4-dp directed ratios must equal
  * a plain-Scala all-pairs recompute. Corpora are built to stress
  * exactly the regimes the filter could lose: planted subsets (true
  * containments at and just under the 0.9 threshold), exact copies
  * (n_a = n_b, the doc_id tie-break path of the ordering predicate), and
  * a shared small vocabulary (hash-order prefixes carry no semantic
  * signal, so a lossy prefix would show up as a missing pair).
  */
object ContainmentProps extends Properties("Containment") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkTestSession.spark

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // small vocabulary => dense overlaps; sizes up to 40 so the prefix
  // length n - ceil(0.8999 n) + 1 takes several distinct values
  private val vocab: Vector[String] = (0 until 24).map(i => s"g$i").toVector

  private val baseDocGen: Gen[Set[String]] = for {
    n <- Gen.chooseNum(1, 14)
    gs <- Gen.pick(math.min(n, vocab.size), vocab)
  } yield gs.toSet

  /** A corpus of base docs plus derived docs: exact copies (size ties)
    * and near-full subsets (containment at/near 1.0 and near 0.9). */
  private val corpusGen: Gen[List[Set[String]]] = for {
    nBase <- Gen.chooseNum(4, 10)
    base <- Gen.listOfN(nBase, baseDocGen)
    copies <- Gen.someOf(base) // exact duplicates: the n_a = n_b path
    subs <- Gen.sequence[List[Set[String]], Set[String]](base.map { d =>
      // drop ~10% of grams: containment of the subset in its parent is
      // (n-k)/(n-k) = 1.0; of the parent in the subset, (n-k)/n — right
      // at the threshold for n around 10
      Gen.chooseNum(0, math.max(1, d.size / 8)).map(k => d.drop(k))
    })
  } yield base ++ copies.toList ++ subs.filter(_.nonEmpty)

  property("prefix-filtered containment equals the all-pairs recompute") =
    Prop.forAll(corpusGen) { docs0 =>
      import spark.implicits._
      val docs = docs0.zipWithIndex.map { case (g, i) => (i.toLong, g) }
      val df = docs.map { case (id, g) => (id, g.toSeq) }
        .toDF("doc_id", "grams")
      val got = graft.operators.Dedup.containmentPairs(df).collect()
        .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
          (r.getAs[Double]("containment_a"),
            r.getAs[Double]("containment_b")))).toMap
      val want = (for {
        (a, ga) <- docs; (b, gb) <- docs if a < b
        inter = (ga & gb).size.toDouble if inter > 0
        ca = round4(inter / ga.size); cb = round4(inter / gb.size)
        if math.max(ca, cb) >= 0.9
      } yield (a, b) -> ((ca, cb))).toMap
      Prop(got == want) :| s"got=${got.size} want=${want.size} " +
        s"missing=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}"
    }
}
