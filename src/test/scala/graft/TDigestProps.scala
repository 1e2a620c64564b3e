package graft

import graft.functions.TDigestAggregator
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the t-digest sketch — pure-JVM invariants
  * (no SparkSession): the digest stays bounded, quantiles stay inside the
  * observed value range and in order, and merging any partition of the
  * data is rank-accurate against the exact quantile.
  *
  * All three props use forAllNoShrink (r17): a failure on a 2000-element
  * double list sends the default shrinker into a minutes-long candidate
  * storm (halving × per-element shrinking, each re-running the digest
  * pipeline) that reads as a hung suite — the raw counter-example prints
  * immediately and is diagnostic enough.
  */
object TDigestProps extends Properties("TDigest") {

  private val agg = new TDigestAggregator(Seq(0.1, 0.5, 0.9), 100)

  private val values: Gen[List[Double]] =
    Gen.chooseNum(50, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)))

  private def digestOf(vs: Seq[Double]) = vs.foldLeft(agg.zero)(agg.reduce)

  property("compressed digest is hard-bounded near delta centroids") =
    Prop.forAllNoShrink(values) { vs =>
      val merged = agg.merge(digestOf(vs), agg.zero) // merge forces a compress
      merged._1.length <= 100 + 2 && merged._1.length == merged._2.length
    }

  property("quantiles are ordered and inside the min/max of the data") =
    Prop.forAllNoShrink(values) { vs =>
      val qs = agg.finish(digestOf(vs))
      qs.sliding(2).forall { case Array(a, b) => a <= b; case _ => true } &&
        qs.forall(q => q >= vs.min && q <= vs.max)
    }

  property("split-and-merge is rank-accurate within the k1 bound vs exact") =
    Prop.forAllNoShrink(values, Gen.chooseNum(2, 8)) { (vs, parts) =>
      val chunkSize = math.max(1, vs.size / parts)
      val merged = vs.grouped(chunkSize).map(digestOf).reduce(agg.merge)
      val qs = agg.finish(merged)
      val sorted = vs.sorted.toIndexedSeq
      val n = sorted.size
      // RANK-space check with a DERIVED tolerance (r17 — the contract
      // t-digest actually makes; the original flat 5% value-space bracket
      // failed ~1 run in 10 and sent the shrinker into a storm):
      //  - value space is wrong outright: on the gap-heavy trimodal
      //    lists chooseNum emphasizes (±1e6 and 0), a centroid whose
      //    members straddle a mode gap has a MEAN inside the gap — a
      //    value no order statistic equals — while its rank error is
      //    inside the digest's guarantee. So the check is that the
      //    estimate's tie-aware rank interval [count(<est), count(≤est)]/n
      //    overlaps [q − tol, q + tol];
      //  - tol: a 1-k-unit centroid at delta = 100 spans up to
      //    2π√(q(1−q))/delta ≈ 3.1% of mass at the median; midpoint
      //    placement + linear interpolation err by up to ~one span, and
      //    the ≤ 7 sequential re-compressions of the merge fold compound
      //    it by a small constant (Dunning & Ertl's merge analysis) —
      //    6.5% covers that with margin; + 2/n for rank discreteness
      //    (at n = 50 a single rank is already 2% of mass).
      Seq(0.1, 0.5, 0.9).zip(qs).forall { case (q, est) =>
        val tol = 0.065 + 2.0 / n
        val rankLo = sorted.count(_ < est).toDouble / n
        val rankHi = sorted.count(_ <= est).toDouble / n
        rankLo <= math.min(1.0, q + tol) && rankHi >= math.max(0.0, q - tol)
      }
    }
}
