package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by (score desc, id asc): keeps the k best (score, id)
  * pairs of a group in a sorted pair of primitive arrays — the partial-
  * aggregating replacement for the `row_number().over(partitionBy(qid)
  * .orderBy(score desc, id asc)) <= k` windows of the exact ANN truth
  * passes (r17, guide §2.3/§2.4: aggregate before the shuffle).
  *
  * The window form shuffles and sorts the FULL per-probe candidate
  * stream — O(panel × corpus) rows through one exchange at drill scale
  * (51M rows at ×100) — to keep k ≤ 8 of them. As an aggregate the
  * map side reduces each partition to ≤ k rows per probe before the
  * exchange, so the shuffle carries O(panel × k × partitions) rows and
  * the per-qid sort disappears. Per-group state is 2 primitive arrays
  * of ≤ k elements; per input row past the cutoff the cost is one
  * comparison against the current k-th (no allocation growth).
  *
  * ORDER EQUIVALENCE is the whole contract: ranking must be
  * bit-identical to the window's SortOrder on (double desc, long asc).
  * Spark compares doubles with `Utils.nanSafeCompareDoubles`, whose
  * `x == y` test makes -0.0 EQUAL to 0.0 (the tie then falls to the id)
  * and ranks NaN above everything; [[CosineTopKAggregator.cmp]]
  * replicates exactly that, NOT `java.lang.Double.compare` (which
  * orders -0.0 < 0.0 and would flip a ±0.0 tie the window breaks by
  * vec_id). `TopKAggProps` pins the equivalence against the window form
  * on random tie-heavy frames including ±0.0 and NaN.
  *
  * Output: the group's pairs in rank order as array<struct<_1:double,
  * _2:long>> — callers posexplode and emit rank = pos + 1, so the
  * (qid, rank, vec_id, cosine) rows are byte-identical to the window's.
  */
class CosineTopKAggregator(k: Int)
    extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Array[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  import CosineTopKAggregator.cmp

  override def zero: (Array[Double], Array[Long]) =
    (Array.empty[Double], Array.empty[Long])

  override def reduce(b: (Array[Double], Array[Long]),
      v: (Double, Long)): (Array[Double], Array[Long]) = {
    val (scores, ids) = b
    val n = scores.length
    // fast reject: full buffer and v does not beat the current k-th
    if (n == k && cmp(v._1, v._2, scores(n - 1), ids(n - 1)) >= 0) return b
    // insertion position in (score desc, id asc) order
    var p = 0
    while (p < n && cmp(scores(p), ids(p), v._1, v._2) <= 0) p += 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m); val ni = new Array[Long](m)
    System.arraycopy(scores, 0, ns, 0, p)
    System.arraycopy(ids, 0, ni, 0, p)
    ns(p) = v._1; ni(p) = v._2
    val tail = m - p - 1
    if (tail > 0) {
      System.arraycopy(scores, p, ns, p + 1, tail)
      System.arraycopy(ids, p, ni, p + 1, tail)
    }
    (ns, ni)
  }

  override def merge(x: (Array[Double], Array[Long]),
      y: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    if (y._1.isEmpty) return x
    if (x._1.isEmpty) return y
    var acc = x
    var i = 0
    while (i < y._1.length) { acc = reduce(acc, (y._1(i), y._2(i))); i += 1 }
    acc
  }

  override def finish(b: (Array[Double], Array[Long])): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](b._1.length)
    var i = 0
    while (i < out.length) { out(i) = (b._1(i), b._2(i)); i += 1 }
    out
  }

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    CosineTopKAggregator.bufferEnc
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    CosineTopKAggregator.outputEnc
}

object CosineTopKAggregator {
  /** (score desc, id asc) comparison with Spark's double semantics:
    * `Utils.nanSafeCompareDoubles` — NaN ranks ABOVE +Inf (so it comes
    * FIRST under desc) and -0.0 == 0.0 (the tie falls to the id). The
    * `a == b` branch covers both the ordinary equal case and ±0.0. */
  private[graft] def cmp(sa: Double, ia: Long, sb: Double, ib: Long): Int = {
    val aNan = java.lang.Double.isNaN(sa)
    val bNan = java.lang.Double.isNaN(sb)
    val byScore =
      if ((aNan && bNan) || sa == sb) 0
      else if (aNan) -1 // NaN greatest under asc => first under desc
      else if (bNan) 1
      else if (sa > sb) -1
      else 1
    if (byScore != 0) byScore
    else java.lang.Long.compare(ia, ib)
  }

  private val bufferEnc: Encoder[(Array[Double], Array[Long])] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
  private val outputEnc: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
}
