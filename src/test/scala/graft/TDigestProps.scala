package graft

import graft.functions.TDigestAggregator
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the t-digest sketch — pure-JVM invariants
  * (no SparkSession): the digest stays bounded, quantiles stay inside the
  * observed value range and in order, and merging any partition of the
  * data is rank-accurate against the exact quantile.
  */
object TDigestProps extends Properties("TDigest") {

  private val agg = new TDigestAggregator(Seq(0.1, 0.5, 0.9), 100)

  private val values: Gen[List[Double]] =
    Gen.chooseNum(50, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)))

  private def digestOf(vs: Seq[Double]) = vs.foldLeft(agg.zero)(agg.reduce)

  property("compressed digest is hard-bounded near delta centroids") =
    Prop.forAll(values) { vs =>
      val merged = agg.merge(digestOf(vs), agg.zero) // merge forces a compress
      merged._1.length <= 100 + 2 && merged._1.length == merged._2.length
    }

  property("quantiles are ordered and inside the min/max of the data") =
    Prop.forAll(values) { vs =>
      val qs = agg.finish(digestOf(vs))
      qs.sliding(2).forall { case Array(a, b) => a <= b; case _ => true } &&
        qs.forall(q => q >= vs.min && q <= vs.max)
    }

  property("split-and-merge is rank-accurate within 5% of n vs exact") =
    Prop.forAll(values, Gen.chooseNum(2, 8)) { (vs, parts) =>
      val chunkSize = math.max(1, vs.size / parts)
      val merged = vs.grouped(chunkSize).map(digestOf).reduce(agg.merge)
      val qs = agg.finish(merged)
      val sorted = vs.sorted.toIndexedSeq
      val n = sorted.size
      // bracket, not point-rank: the estimate must land between the exact
      // order statistics at q∓5% — robust to duplicate-heavy inputs where
      // a single value legitimately spans a wide rank range
      Seq(0.1, 0.5, 0.9).zip(qs).forall { case (q, est) =>
        val lo = sorted((math.max(0.0, q - 0.05) * (n - 1)).floor.toInt)
        val hi = sorted((math.min(1.0, q + 0.05) * (n - 1)).ceil.toInt)
        lo <= est && est <= hi
      }
    }
}
