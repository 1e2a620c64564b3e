package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise mean of `Array[Float]` embeddings (cluster
  * centroid). Deliberate `Aggregator` coverage (SURVEY.md §7.3) — the
  * buffer is a mutable (sums, count) pair so partial aggregation
  * (map-side combine) works exactly like a built-in: reduce locally per
  * partition, merge across partitions, never collect vectors to the driver.
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (sx, nx) = x
    val (sy, ny) = y
    var i = 0
    while (i < dim) { sx(i) += sy(i); i += 1 }
    (sx, nx + ny)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] = {
    val (sums, n) = b
    if (n == 0) sums else sums.map(_ / n)
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExprEnc.doubleArray, Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = ExprEnc.doubleArray
}

private object ExprEnc {
  val doubleArray: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
