package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One retained counter of a Misra–Gries summary: the true count of `item`
  * lies in `[est_count, est_count + err_bound]`.
  */
case class FrequentItem(item: String, est_count: Long, err_bound: Long)

/** Mergeable Misra–Gries heavy-hitters summary (buffer state): at most
  * `capacity` counters plus the total decrement `dec` applied so far, which
  * bounds every counter's undercount.
  */
case class FrequentItemsSummary(counts: Map[String, Long], dec: Long)

/** Misra–Gries frequent-items sketch as a typed UDAF — the 100 TB
  * heavy-hitters path, completing the sketch family next to HLL
  * (`approx_count_distinct`), GK (`percentile_approx`) and the t-digest
  * UDAF: O(capacity) state per group, map-side partial aggregation, and a
  * merge that keeps the classic guarantee
  *
  *   true_count - dec  <=  est_count  <=  true_count,
  *
  * i.e. every reported count underestimates by at most `dec`, and any item
  * with true frequency > n / (capacity + 1) is guaranteed to be retained.
  * The merge rule is the mergeable-summaries construction (Agarwal et al.,
  * PODS 2012): sum counters pointwise, then subtract the (capacity+1)-th
  * largest value and drop non-positive counters, folding the subtraction
  * into `dec`.
  *
  * When `capacity` is at least the true vocabulary size no decrement ever
  * fires, `dec` stays 0 and the summary IS the exact frequency table —
  * which is what makes the fixture query deterministically
  * oracle-checkable while the lossy regime is exercised by the unit spec.
  */
class FrequentItemsAggregator(capacity: Int)
    extends Aggregator[String, FrequentItemsSummary, Seq[FrequentItem]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: FrequentItemsSummary = FrequentItemsSummary(Map.empty, 0L)

  override def reduce(b: FrequentItemsSummary, item: String): FrequentItemsSummary =
    b.counts.get(item) match {
      case Some(c) => b.copy(counts = b.counts.updated(item, c + 1L))
      case None if b.counts.size < capacity =>
        b.copy(counts = b.counts.updated(item, 1L))
      case None =>
        // classic MG step: a full summary meets an untracked item — decrement
        // every counter (the new item's single occurrence cancels against
        // them), drop zeros. Fires at most n/capacity times over n inserts.
        FrequentItemsSummary(
          b.counts.collect { case (k, c) if c > 1L => (k, c - 1L) },
          b.dec + 1L)
    }

  override def merge(a: FrequentItemsSummary, b: FrequentItemsSummary): FrequentItemsSummary = {
    val summed = b.counts.foldLeft(a.counts) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) FrequentItemsSummary(summed, a.dec + b.dec)
    else {
      // subtract the (capacity+1)-th largest count from everything: at most
      // `capacity` counters stay positive, and the subtraction is a uniform
      // additional undercount, so it folds into `dec`
      val cut = summed.values.toSeq.sortBy(-_).apply(capacity)
      FrequentItemsSummary(
        summed.collect { case (k, c) if c > cut => (k, c - cut) },
        a.dec + b.dec + cut)
    }
  }

  override def finish(r: FrequentItemsSummary): Seq[FrequentItem] =
    r.counts.toSeq
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) => FrequentItem(item, c, r.dec) }

  override def bufferEncoder: Encoder[FrequentItemsSummary] =
    Encoders.product[FrequentItemsSummary]
  override def outputEncoder: Encoder[Seq[FrequentItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[FrequentItem]]()
}
