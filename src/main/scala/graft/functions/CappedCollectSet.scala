package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Size-capped distinct collect: gathers the distinct `Long` values of a
  * group into a sorted array, but the moment the distinct count reaches
  * `cap` the buffer OVERFLOWS — it drops its elements, remembers only the
  * overflow bit, and `finish` returns an empty array.
  *
  * Built for the winnow posting lists (VERDICT r15 item 1): the retention
  * rule there is "keep a fingerprint's posting iff its distinct doc count
  * is < hotCap", and the r15 plan expressed it as
  * `collect_list(...)` THEN `filter(size < cap)` — which materializes the
  * FULL posting of a corpus-wide boilerplate fingerprint in one
  * aggregation buffer before dropping it (100M docs sharing a license
  * header ⇒ one ~800 MB array in a single ObjectHashAggregate buffer ⇒
  * executor OOM, invisible at every drilled scale). This aggregator makes
  * the cap a property of the BUFFER: per-group state is hard-bounded at
  * `cap - 1` longs + a flag no matter how many rows the group has, map-side
  * partials included, so a mega-hot key costs O(cap) memory and O(1) per
  * extra row. Overflow ⇒ empty output ⇒ the posting vanishes from
  * `explode`/`size >= 2` consumers — semantics identical to
  * collect-then-filter (proven by `WinnowProps` against a plain-JVM
  * recompute and by `CorpusHealthSpec`'s mega-hot-fingerprint test).
  *
  * Set semantics (distinct) so the index-compaction fold can dedup
  * `(doc_id, fp)` rows on the same exchange; for inputs that are already
  * row-distinct per group (winnow fingerprints are per-doc distinct) set
  * and list collects coincide. `cap` is small (the winnow hot cap is 16),
  * so membership is a linear scan of an `Array[Long]` — no hashing, no
  * boxing, cheaper than `collect_set`'s `OpenHashSet` at these sizes.
  */
class CappedCollectSetAggregator(cap: Int)
    extends Aggregator[Long, (Array[Long], Boolean), Array[Long]] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  private val Overflowed: (Array[Long], Boolean) = (Array.empty[Long], true)

  override def zero: (Array[Long], Boolean) = (Array.empty[Long], false)

  override def reduce(b: (Array[Long], Boolean), v: Long): (Array[Long], Boolean) = {
    if (b._2) return b
    val elems = b._1
    var i = 0
    while (i < elems.length) { if (elems(i) == v) return b; i += 1 }
    if (elems.length + 1 >= cap) Overflowed
    else {
      val grown = java.util.Arrays.copyOf(elems, elems.length + 1)
      grown(elems.length) = v
      (grown, false)
    }
  }

  override def merge(x: (Array[Long], Boolean),
      y: (Array[Long], Boolean)): (Array[Long], Boolean) = {
    if (x._2 || y._2) return Overflowed
    // fold the smaller side into the larger; both are < cap elements
    val (base, add) = if (x._1.length >= y._1.length) (x, y._1) else (y, x._1)
    var acc = base
    var i = 0
    while (i < add.length) {
      acc = reduce(acc, add(i))
      if (acc._2) return acc
      i += 1
    }
    acc
  }

  override def finish(b: (Array[Long], Boolean)): Array[Long] =
    if (b._2) Array.empty[Long]
    else { val out = b._1.clone(); java.util.Arrays.sort(out); out }

  override def bufferEncoder: Encoder[(Array[Long], Boolean)] =
    Encoders.tuple(CappedEnc.longArray, Encoders.scalaBoolean)
  override def outputEncoder: Encoder[Array[Long]] = CappedEnc.longArray
}

private object CappedEnc {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
