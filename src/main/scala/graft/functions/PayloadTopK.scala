package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** [[CosineTopKAggregator]] generalized along the two axes the serving
  * paths need (r18): an ORDER DIRECTION (ascending for ADC distances,
  * descending for cosines) and a LONG PAYLOAD that rides with each kept
  * row — the serve join's `cell`, which is per-CANDIDATE (each corpus
  * vector lives in its own cell) and so cannot ride as the group-constant
  * `min` carry the LSH bucket uses in `Similarity.topkByQid`.
  *
  * ORDER EQUIVALENCE contract (the [[CosineTopKAggregator]] proof
  * obligations, direction-parameterized): ranking is bit-identical to
  * `row_number().over(partitionBy(g).orderBy(score asc|desc, id asc))`.
  * Spark's SortOrder compares doubles with `Utils.nanSafeCompareDoubles`
  * — NaN is GREATEST (last under asc, FIRST under desc) and -0.0 == 0.0
  * (the tie falls to the id) — which is exactly what
  * [[PayloadTopKAggregator.cmpScore]] replicates; `PayloadTopKAggProps`
  * pins both directions against the window form on random tie-heavy
  * frames including ±0.0 and NaN.
  *
  * PRECONDITION (the same distinctness the window form's determinism
  * rests on): ids are distinct within a group — every call site feeds a
  * relation keyed by (group, id). A duplicate (score, id) row arriving at
  * a full buffer is rejected where `row_number` would assign it the next
  * rank; payloads of duplicate ids could also differ. The payload itself
  * is inert: never compared, it only travels with its row.
  *
  * Output: the group's rows in rank order as
  * array<struct<_1:double,_2:long,_3:long>> — callers posexplode and
  * emit rank = pos + 1.
  */
class PayloadTopKAggregator(k: Int, asc: Boolean)
    extends Aggregator[(Double, Long, Long),
      (Array[Double], Array[Long], Array[Long]),
      Array[(Double, Long, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def cmp(sa: Double, ia: Long, sb: Double, ib: Long): Int = {
    val byScore = PayloadTopKAggregator.cmpScore(asc, sa, sb)
    if (byScore != 0) byScore
    else java.lang.Long.compare(ia, ib)
  }

  override def zero: (Array[Double], Array[Long], Array[Long]) =
    (Array.empty[Double], Array.empty[Long], Array.empty[Long])

  override def reduce(b: (Array[Double], Array[Long], Array[Long]),
      v: (Double, Long, Long)): (Array[Double], Array[Long], Array[Long]) = {
    val (scores, ids, pays) = b
    val n = scores.length
    // fast reject: full buffer and v does not beat the current k-th
    if (n == k && cmp(v._1, v._2, scores(n - 1), ids(n - 1)) >= 0) return b
    // insertion position in (score order, id asc)
    var p = 0
    while (p < n && cmp(scores(p), ids(p), v._1, v._2) <= 0) p += 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m); val ni = new Array[Long](m)
    val np = new Array[Long](m)
    System.arraycopy(scores, 0, ns, 0, p)
    System.arraycopy(ids, 0, ni, 0, p)
    System.arraycopy(pays, 0, np, 0, p)
    ns(p) = v._1; ni(p) = v._2; np(p) = v._3
    val tail = m - p - 1
    if (tail > 0) {
      System.arraycopy(scores, p, ns, p + 1, tail)
      System.arraycopy(ids, p, ni, p + 1, tail)
      System.arraycopy(pays, p, np, p + 1, tail)
    }
    (ns, ni, np)
  }

  override def merge(x: (Array[Double], Array[Long], Array[Long]),
      y: (Array[Double], Array[Long], Array[Long]))
      : (Array[Double], Array[Long], Array[Long]) = {
    if (y._1.isEmpty) return x
    if (x._1.isEmpty) return y
    var acc = x
    var i = 0
    while (i < y._1.length) { acc = reduce(acc, (y._1(i), y._2(i), y._3(i))); i += 1 }
    acc
  }

  override def finish(b: (Array[Double], Array[Long], Array[Long]))
      : Array[(Double, Long, Long)] = {
    val out = new Array[(Double, Long, Long)](b._1.length)
    var i = 0
    while (i < out.length) { out(i) = (b._1(i), b._2(i), b._3(i)); i += 1 }
    out
  }

  override def bufferEncoder: Encoder[(Array[Double], Array[Long], Array[Long])] =
    PayloadTopKAggregator.bufferEnc
  override def outputEncoder: Encoder[Array[(Double, Long, Long)]] =
    PayloadTopKAggregator.outputEnc
}

object PayloadTopKAggregator {
  /** Direction-parameterized score comparison with Spark's double
    * SortOrder semantics (`Utils.nanSafeCompareDoubles`): NaN is the
    * GREATEST value and -0.0 == 0.0 (the tie then falls to the id).
    * Returns < 0 when `sa` ranks BEFORE `sb` under the given direction —
    * for asc = false this is exactly [[CosineTopKAggregator.cmp]]'s
    * score branch. */
  private[graft] def cmpScore(asc: Boolean, sa: Double, sb: Double): Int = {
    val aNan = java.lang.Double.isNaN(sa)
    val bNan = java.lang.Double.isNaN(sb)
    val byAsc =
      if ((aNan && bNan) || sa == sb) 0
      else if (aNan) 1 // NaN greatest: last under asc, first under desc
      else if (bNan) -1
      else if (sa < sb) -1
      else 1
    if (asc) byAsc else -byAsc
  }

  private val bufferEnc: Encoder[(Array[Double], Array[Long], Array[Long])] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
  private val outputEnc: Encoder[Array[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long, Long)]]()
}

/** Bounded top-k by (count desc, key asc) for STRING-keyed frequency
  * ranks — the per-source top-bigram window's aggregate form
  * (`ngram_top_per_source`, r18). Same partial-aggregating rationale as
  * [[CosineTopKAggregator]]: each map partition reduces to ≤ k rows per
  * group before the exchange and the per-group sort disappears; here it
  * additionally lets the group aggregate compute `sum(cnt)` in the SAME
  * pass, which removes the second tokenize+shingle scan the
  * `counts → join(tot)` form paid.
  *
  * ORDER EQUIVALENCE: Spark's SortOrder on strings is UTF8String binary
  * comparison — unsigned byte-wise over the UTF-8 encoding (= code-point
  * order), NOT java.lang.String.compareTo (UTF-16 code-unit order, which
  * disagrees above the BMP) — so keys are held and compared as UTF-8
  * byte arrays. DuckDB's default collation is the same binary UTF-8
  * order, which is why the oracle agrees on tie-breaks today; the
  * aggregate must not introduce a third ordering.
  *
  * PRECONDITION: keys are distinct within a group (the call site groups
  * a (group, key)-aggregated relation). Output: rank-ordered
  * array<struct<_1:long,_2:string>>.
  */
class CountTopKAggregator(k: Int)
    extends Aggregator[(Long, String), (Array[Long], Array[Array[Byte]]),
      Array[(Long, String)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  import CountTopKAggregator.cmp

  override def zero: (Array[Long], Array[Array[Byte]]) =
    (Array.empty[Long], Array.empty[Array[Byte]])

  private def reduceBytes(b: (Array[Long], Array[Array[Byte]]),
      cnt: Long, key: Array[Byte]): (Array[Long], Array[Array[Byte]]) = {
    val (cnts, keys) = b
    val n = cnts.length
    if (n == k && cmp(cnt, key, cnts(n - 1), keys(n - 1)) >= 0) return b
    var p = 0
    while (p < n && cmp(cnts(p), keys(p), cnt, key) <= 0) p += 1
    val m = math.min(n + 1, k)
    val nc = new Array[Long](m); val nk = new Array[Array[Byte]](m)
    System.arraycopy(cnts, 0, nc, 0, p)
    System.arraycopy(keys, 0, nk, 0, p)
    nc(p) = cnt; nk(p) = key
    val tail = m - p - 1
    if (tail > 0) {
      System.arraycopy(cnts, p, nc, p + 1, tail)
      System.arraycopy(keys, p, nk, p + 1, tail)
    }
    (nc, nk)
  }

  override def reduce(b: (Array[Long], Array[Array[Byte]]),
      v: (Long, String)): (Array[Long], Array[Array[Byte]]) =
    reduceBytes(b, v._1, v._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def merge(x: (Array[Long], Array[Array[Byte]]),
      y: (Array[Long], Array[Array[Byte]])): (Array[Long], Array[Array[Byte]]) = {
    if (y._1.isEmpty) return x
    if (x._1.isEmpty) return y
    var acc = x
    var i = 0
    while (i < y._1.length) { acc = reduceBytes(acc, y._1(i), y._2(i)); i += 1 }
    acc
  }

  override def finish(b: (Array[Long], Array[Array[Byte]])): Array[(Long, String)] = {
    val out = new Array[(Long, String)](b._1.length)
    var i = 0
    while (i < out.length) {
      out(i) = (b._1(i),
        new String(b._2(i), java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[(Array[Long], Array[Array[Byte]])] =
    CountTopKAggregator.bufferEnc
  override def outputEncoder: Encoder[Array[(Long, String)]] =
    CountTopKAggregator.outputEnc
}

object CountTopKAggregator {
  /** (count desc, key asc) — key order is unsigned byte-wise over UTF-8
    * (UTF8String.binaryCompare), the comparison Spark's string SortOrder
    * performs. */
  private[graft] def cmp(ca: Long, ka: Array[Byte],
      cb: Long, kb: Array[Byte]): Int = {
    val byCnt = java.lang.Long.compare(cb, ca) // desc
    if (byCnt != 0) return byCnt
    val len = math.min(ka.length, kb.length)
    var i = 0
    while (i < len) {
      val d = (ka(i) & 0xff) - (kb(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    ka.length - kb.length
  }

  private val bufferEnc: Encoder[(Array[Long], Array[Array[Byte]])] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Array[Byte]]]())
  private val outputEnc: Encoder[Array[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, String)]]()
}
