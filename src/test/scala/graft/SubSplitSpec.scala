package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The semdedup second-level residual sub-split (r17 — the knee drill's
  * finding): past the [[Similarity.IvfMaxCells]] cap, within-cell
  * candidate mass grows n²/cap and the cap-1024 knee ladder measured
  * past-knee prune exponents of 1.35→1.68 on a fixture with provably
  * linear true-dup mass. Cells above the occupancy bound now split into
  * residual sub-cells and the pair join runs per (cell, sub) scope.
  *
  * A hot cell needs occupancy > cap² — unreachable at fixture scale (the
  * codebook spreads any blob until k pins at the cap) — so the
  * integration tests inject the plan via `semdedupFlagsSplit` and check
  * the split machinery against a plain-JVM recompute of the keep rule at
  * (cell, sub) scope, plus the verdict arithmetic over the split frame.
  * The pure `subSplitPlan` arithmetic is pinned separately.
  */
class SubSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val bound = Similarity.SubSplitOccBound

  test("subSplitPlan: no cell over the bound -> no split") {
    assert(Similarity.subSplitPlan(Map.empty) == ((Set.empty[Int], 1)))
    assert(Similarity.subSplitPlan(Map(0 -> bound, 3 -> 1L)) ==
      ((Set.empty[Int], 1)))
  }

  test("subSplitPlan: k2 = ceil(max hot occupancy / bound), min 2") {
    // barely hot: ceil(occ/bound) = 2 via the min-2 floor
    assert(Similarity.subSplitPlan(Map(7 -> (bound + 1))) == ((Set(7), 2)))
    // two hot cells, k2 sized by the HOTTEST, cold cell excluded
    val (hot, k2) = Similarity.subSplitPlan(
      Map(1 -> (bound * 10), 2 -> (bound + 5), 3 -> (bound - 1)))
    assert(hot == Set(1, 2) && k2 == 10)
  }

  test("subSplitPlan: k2 never exceeds the cell cap") {
    val (_, k2) = Similarity.subSplitPlan(
      Map(0 -> bound * bound * 4))
    assert(k2 == Similarity.IvfMaxCells)
  }

  test("forced split: scoped keep rule matches a plain-JVM recompute; " +
    "cold cells keep their unsplit flags") {
    val plain = Similarity.semdedupFlags(spark, sf).collect()
    val cells = plain.map(_.getAs[Int]("cell")).distinct.sorted
    assert(cells.length > 1, "fixture must span several cells")
    // split the busiest cell only; the rest stay cold
    val hot = plain.groupBy(_.getAs[Int]("cell"))
      .maxBy(_._2.length)._1
    val k2 = 4
    val split = Similarity.semdedupFlagsSplit(spark, sf, Set(hot), k2)
      .collect()
    assert(split.length == plain.length)
    val subs = split.map(r => (r.getAs[Int]("cell"), r.getAs[Int]("sub")))
    assert(subs.filter(_._1 != hot).forall(_._2 == 0),
      "cold cells must keep sub = 0")
    val hotSubs = subs.filter(_._1 == hot).map(_._2).distinct
    assert(hotSubs.length > 1 && hotSubs.forall(s => s >= 0 && s < k2),
      s"the hot cell must actually split (got subs ${hotSubs.toSeq})")
    // plain-JVM recompute of the keep rule at (cell, sub) scope — the
    // OperatorSpec brute force with the scope key extended
    val vecs = split.map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray,
        r.getAs[Double]("nrm"), r.getAs[Int]("cell"), r.getAs[Int]("sub"),
        r.getAs[Double]("csim"))
    }
    val expectDropped = (for {
      (ia, ea, na, ca, suba, sa) <- vecs.iterator
      (ib, eb, nb, cb, subb, sb) <- vecs.iterator
      if ia < ib && ca == cb && suba == subb
      cos = BigDecimal(ea.zip(eb).map { case (x, y) => x.toDouble * y }.sum / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= 0.4
    } yield if (sa > sb || (sa == sb && ia > ib)) ia else ib).toSet
    val dropped = split.filter(_.getAs[Boolean]("dropped"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(dropped == expectDropped,
      s"scoped dropped mismatch — engine-only: ${(dropped -- expectDropped).take(5)}, " +
        s"brute-only: ${(expectDropped -- dropped).take(5)}")
    // cold cells: identical verdicts to the unsplit run (their pair
    // families are untouched by another cell's split)
    val plainDrop = plain.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Boolean]("dropped")).toMap
    val coldMismatch = split.filter(_.getAs[Int]("cell") != hot)
      .filter(r => plainDrop(r.getAs[Long]("vec_id")) != r.getAs[Boolean]("dropped"))
    assert(coldMismatch.isEmpty,
      s"cold-cell flags drifted: ${coldMismatch.take(3).toSeq}")
  }

  test("verdict arithmetic holds over a split frame") {
    val plain = Similarity.semdedupFlags(spark, sf).collect()
    val hot = plain.groupBy(_.getAs[Int]("cell")).maxBy(_._2.length)._1
    val k2 = 4
    val flags = Similarity.semdedupFlagsSplit(spark, sf, Set(hot), k2)
    val v = Similarity.semdedupVerdicts(flags).collect().head
    assert(v.getAs[Boolean]("conservation_ok"))
    assert(v.getAs[Boolean]("resolved_ok"))
    assert(v.getAs[Boolean]("dropped_have_neighbor_ok"))
    // the co-scope floor is recomputed independently and the BOOLEAN is
    // pinned to the recompute (the split legitimately lowers the share;
    // the verdict must report that honestly, whichever side of the floor
    // it lands on)
    val rows = flags.collect()
    val vecs = rows.map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray,
        r.getAs[Double]("nrm"), r.getAs[Int]("cell"), r.getAs[Int]("sub"))
    }
    val probePairs = (for {
      (ia, ea, na, ca, suba) <- vecs.iterator if ia < 200
      (ib, eb, nb, cb, subb) <- vecs.iterator
      if ia < ib
      cos = BigDecimal(ea.zip(eb).map { case (x, y) => x.toDouble * y }.sum / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= 0.4
    } yield (ca == cb && suba == subb)).toSeq
    val expectFloor =
      probePairs.count(identity).toLong * 100 >= probePairs.size.toLong * 25
    assert(v.getAs[Boolean]("coclustered_floor_ok") == expectFloor)
  }
}
