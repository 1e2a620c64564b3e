package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A finished count-min sketch: `table` is a row-major `depth × width`
  * grid of counters, `total` the number of inserts. The classic guarantee
  * is `exact <= estimate <= exact + e/width * total` with probability
  * `1 - e^-depth` (Cormode & Muthukrishnan 2005). Carrying depth/width in
  * the sketch makes a wrong-geometry probe unrepresentable JVM-side;
  * Column-side probes (`cms_user_counts`, `Streams.frequencyMonitor`)
  * mirror [[estimate]]'s index arithmetic and must stay in sync with it.
  */
case class CmsSketch(depth: Int, width: Int, total: Long, table: Seq[Long]) {
  /** Point estimate: min over grid rows of this item's counter. */
  def estimate(item: String): Long =
    (0 until depth).map { d =>
      table(d * width + (Portable.hash28Jvm(s"$d:$item") % width).toInt)
    }.min
}

/** Count-min frequency sketch as a typed UDAF — the mergeable
  * point-frequency summary completing the sketch family next to HLL
  * (distinct counts), Misra–Gries (heavy hitters; MG answers "which items
  * are frequent", CMS answers "how frequent is THIS item" for any item),
  * GK and t-digest (quantiles): O(depth × width) state per group
  * regardless of cardinality, map-side partial aggregation, and a merge
  * that is exact (pointwise counter sum), so executor-local sketches
  * combine into the same grid a single pass would build — the property
  * that lets a 1000-executor scan answer frequency point queries with one
  * tiny exchange.
  *
  * Buckets use the portable md5-derived [[Portable.hash28Jvm]] (seeded by
  * the row index), NOT a seeded RNG or murmur: determinism across engines
  * is the project contract, and it is what lets the DuckDB oracle rebuild
  * the identical grid from SQL and compare estimates value-for-value. A
  * throughput-tuned variant would swap in a cheaper hash family; the
  * sketch math is hash-agnostic as long as rows stay pairwise independent.
  */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, (Array[Long], Long), CmsSketch] {
  require(depth > 0 && width > 0, "depth and width must be positive")

  override def zero: (Array[Long], Long) = (new Array[Long](depth * width), 0L)

  private def bucket(d: Int, item: String): Int =
    (Portable.hash28Jvm(s"$d:$item") % width).toInt

  override def reduce(b: (Array[Long], Long), item: String): (Array[Long], Long) = {
    var d = 0
    while (d < depth) { b._1(d * width + bucket(d, item)) += 1L; d += 1 }
    (b._1, b._2 + 1L)
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    var i = 0
    while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Long], Long)): CmsSketch =
    CmsSketch(depth, width, r._2, r._1.toSeq)

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    Encoders.tuple(CmsEnc.longArray, Encoders.scalaLong)
  override def outputEncoder: Encoder[CmsSketch] = Encoders.product[CmsSketch]
}

private object CmsEnc {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
