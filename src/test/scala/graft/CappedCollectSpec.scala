package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CappedCollectSetAggregator

/** Unit semantics of the size-capped distinct collect that bounds the
  * winnow posting-list buffers (VERDICT r15 item 1). The load-bearing
  * claim is the MEMORY bound: per-group state never exceeds cap−1 longs
  * no matter how many rows fold in — the distributed parity with
  * collect-then-filter is pinned end-to-end by `CorpusHealthSpec`'s
  * mega-hot-fingerprint test and `WinnowProps`' brute-force recompute.
  */
class CappedCollectSpec extends AnyFunSuite {
  private val cap = 16

  test("buffer never holds more than cap-1 elements, even for a mega-hot key") {
    val a = new CappedCollectSetAggregator(cap)
    var b = a.zero
    (0 until 100000).foreach { v =>
      b = a.reduce(b, v.toLong)
      assert(b._1.length <= cap - 1, s"buffer grew to ${b._1.length} at $v")
    }
    assert(b._2, "100k distinct values must overflow a cap-16 buffer")
    assert(b._1.isEmpty, "an overflowed buffer must release its elements")
    assert(a.finish(b).isEmpty, "overflow finishes empty (posting dropped)")
  }

  test("distinct semantics: duplicates never advance the count") {
    val a = new CappedCollectSetAggregator(cap)
    var b = a.zero
    (0 until 1000).foreach(_ => b = a.reduce(b, 7L))
    assert(!b._2 && b._1.sameElements(Array(7L)))
  }

  test("exactly cap-1 distinct values survive; the cap-th overflows") {
    val a = new CappedCollectSetAggregator(cap)
    var b = a.zero
    (1 to cap - 1).foreach(v => b = a.reduce(b, v.toLong))
    assert(!b._2 && b._1.length == cap - 1)
    b = a.reduce(b, 99L)
    assert(b._2 && a.finish(b).isEmpty)
  }

  test("merge dedups across sides and overflow is contagious") {
    val a = new CappedCollectSetAggregator(cap)
    def buf(vs: Long*) = vs.foldLeft(a.zero)(a.reduce)
    // overlapping halves: union has 9 distinct < cap
    val m = a.merge(buf(1L to 6L: _*), buf(4L to 9L: _*))
    assert(!m._2 && a.finish(m).sameElements(Array.range(1, 10).map(_.toLong)))
    // disjoint halves whose union reaches cap: overflow
    val o = a.merge(buf(1L to 8L: _*), buf(100L until 108L: _*))
    assert(o._2)
    // one overflowed side poisons any merge
    val big = (0 until cap).foldLeft(a.zero)((b, v) => a.reduce(b, v.toLong))
    assert(a.merge(big, buf(42L))._2 && a.merge(buf(42L), big)._2)
  }

  test("finish sorts (replaces the old explicit array_sort)") {
    val a = new CappedCollectSetAggregator(cap)
    val b = Seq(9L, 3L, 7L, 1L).foldLeft(a.zero)(a.reduce)
    assert(a.finish(b).sameElements(Array(1L, 3L, 7L, 9L)))
  }

  test("parity with collect-then-filter on exhaustive small groups") {
    // the retention rule: kept iff distinct count < cap, output sorted
    val a = new CappedCollectSetAggregator(4)
    val universe = Seq(1L, 2L, 3L, 4L, 5L)
    def expected(vs: Seq[Long]): Array[Long] = {
      val d = vs.distinct
      if (d.size < 4) d.sorted.toArray else Array.empty[Long]
    }
    // all multisets of length <= 5 over a 5-value universe (with repeats)
    def groups(n: Int): Iterator[Seq[Long]] =
      if (n == 0) Iterator(Seq.empty)
      else groups(n - 1).flatMap(g => universe.map(g :+ _))
    (0 to 5).iterator.flatMap(groups).foreach { g =>
      val got = a.finish(g.foldLeft(a.zero)(a.reduce))
      assert(got.sameElements(expected(g)), s"group $g")
      // and via an arbitrary split + merge (associativity across partitions)
      (0 to g.size).foreach { cut =>
        val (l, r) = g.splitAt(cut)
        val m = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
        assert(a.finish(m).sameElements(expected(g)), s"group $g cut $cut")
      }
    }
  }
}
