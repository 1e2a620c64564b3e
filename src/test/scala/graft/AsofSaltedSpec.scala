package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-safety of the salted as-of pre-pass (`TemporalJoins.asofSaltedLe`):
  * drives one engineered hot key (50× the median key's rows) through the
  * NATIVE as-of path and asserts, from per-task shuffle-read metrics, that
  * the straggler the bare exec would produce is gone — no merge-stage task
  * reads more than ~2× the median task's rows — while the bare exec on the
  * same data shows the straggler (max ≥ 4× median). Value semantics are
  * pinned twice: row-for-row parity with the unsalted native join here, and
  * the `asof_join_salted` fixture query sharing `asof_join_native`'s DuckDB
  * oracle in the driver run.
  */
class AsofSaltedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Engineered skew: key 0 has 5 000 left rows; 40 cold keys have 100
    * each (hot = 50× median). Right side: 5 rows per key.
    */
  private def skewedLeft = {
    val hot = spark.range(0, 5000)
      .select(lit(0L).as("k"), (col("id") * 3L).as("t"))
    val cold = spark.range(0, 4000)
      .select((col("id") % 40L + 1L).as("k"), (col("id") * 5L).as("t"))
    hot.unionAll(cold)
  }
  private def right = spark.range(0, 205)
    .select((col("id") % 41L).as("rk"), (col("id") * 11L).as("rt"))

  private def mergeStageTaskReads(run: => Unit): Seq[Long] =
    TaskMetricsProbe.mergeStageTaskReads(spark)(run)

  test("salted pre-pass balances a 50x hot key; bare native exec does not") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    val confs = Seq(
      // fixed task count so per-task medians are meaningful (no AQE
      // coalescing), and no broadcast so the merge path actually runs
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val l = skewedLeft.cache(); val r = right.cache()
      l.count(); r.count() // materialize so the measured job is join-only

      val bare = l.join(r, expr("k = rk AND asof_le(t, rt)"), "left")
      val salted = TemporalJoins.asofSaltedLe(l, r, Seq("k"), Seq("rk"),
        "t", "rt", buckets = 25, hotThreshold = 1000L)

      // value parity first: salted output must be row-identical to the
      // bare native join (same multiplicity, same matches)
      def key(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(x => (x.getLong(0), x.getLong(1),
          if (x.isNullAt(3)) -1L else x.getLong(3)))
        .sorted.toSeq
      // scaladoc contract: output column ORDER is left columns then right
      // columns, exactly what the bare join produces (the internal tag
      // joins must not leak their key-first reordering)
      assert(salted.columns.toSeq == bare.columns.toSeq,
        s"column order diverged: ${salted.columns.toSeq} vs ${bare.columns.toSeq}")
      val bareRows = bare.select("k", "t", "rk", "rt").collect()
      val saltedRows = salted.select("k", "t", "rk", "rt").collect()
      assert(bareRows.length == 9000 && saltedRows.length == 9000,
        "as-of must emit exactly one row per left row")
      assert(key(saltedRows) == key(bareRows),
        "salted and bare native as-of joins disagree")

      // straggler evidence: bare exec puts the hot key on one task
      val bareReads = mergeStageTaskReads { bare.collect() }
      val bareMax = bareReads.max
      val bareMed = bareReads.sorted.apply(bareReads.size / 2).max(1L)
      assert(bareMax >= 4 * bareMed,
        s"expected a straggler in the unsalted merge stage, " +
          s"got max=$bareMax median=$bareMed across ${bareReads.size} tasks")

      // no task may read more than ~2x the median task's rows, and the
      // salted plan must still be the native exec (salt is just one more
      // equi-conjunct to the strategy) — asserted on the measured run
      val saltReads = mergeStageTaskReads { salted.collect() }
      assert(salted.queryExecution.executedPlan.toString.contains("AsofJoin"),
        "salted join no longer plans on the native exec")
      val saltMax = saltReads.max
      val saltMed = saltReads.sorted.apply(saltReads.size / 2).max(1L)
      assert(saltMax <= 2 * saltMed,
        s"salted merge stage still skewed: max=$saltMax median=$saltMed " +
          s"reads=${saltReads.sorted.mkString(",")}")
      l.unpersist(); r.unpersist()
    } finally prev.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }

  test("diagnostic-driven auto salting matches manual balance and output on the 50x fixture") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val l = skewedLeft.cache(); val r = right.cache()
      l.count(); r.count()
      val manual = TemporalJoins.asofSaltedLe(l, r, Seq("k"), Seq("rk"),
        "t", "rt", buckets = 25, hotThreshold = 1000L)
      // NO per-dataset constants: the hot set (key 0, 50x median) and its
      // salt factor (ceil(5000/100) = 50, capped 64) come from the
      // skew-diagnostic rule applied to the data itself
      val auto = TemporalJoins.asofSaltedAutoLe(l, r, Seq("k"), Seq("rk"),
        "t", "rt")
      assert(auto.columns.toSeq == (l.columns ++ r.columns).toSeq)
      // value parity: auto output row-identical to the manual salted form
      def key(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(x => (x.getLong(0), x.getLong(1),
          if (x.isNullAt(3)) -1L else x.getLong(3)))
        .sorted.toSeq
      val autoRows = auto.select("k", "t", "rk", "rt").collect()
      assert(autoRows.length == 9000,
        "as-of must emit exactly one row per left row")
      assert(key(autoRows) == key(manual.select("k", "t", "rk", "rt").collect()),
        "auto-salted and manually-salted as-of joins disagree")
      // balance parity with the manual configuration's bound: no merge
      // task reads more than ~2x the median task's rows
      val reads = mergeStageTaskReads { auto.collect() }
      assert(auto.queryExecution.executedPlan.toString.contains("AsofJoin"),
        "auto-salted join no longer plans on the native exec")
      val mx = reads.max
      val md = reads.sorted.apply(reads.size / 2).max(1L)
      assert(mx <= 2 * md,
        s"auto-salted merge stage still skewed: max=$mx median=$md " +
          s"reads=${reads.sorted.mkString(",")}")
      l.unpersist(); r.unpersist()
    } finally prev.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }

  test("auto salting on cold-only data detects no hot keys: salt-0 passthrough") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    // uniform keys: no count exceeds skewRatio x median, hot set is empty
    val l = spark.range(0, 400)
      .select((col("id") % 40L).as("k"), (col("id") * 3L).as("t"))
    val auto = TemporalJoins.asofSaltedAutoLe(l, right, Seq("k"), Seq("rk"),
      "t", "rt")
    val bare = l.join(right, expr("k = rk AND asof_le(t, rt)"), "left")
    assert(auto.count() == 400)
    assert(auto.select("k", "t", "rt").collect().map(_.toString).sorted.toSeq ==
      bare.select("k", "t", "rt").collect().map(_.toString).sorted.toSeq)
  }

  test("cold-only data takes the salt-0 passthrough: no replication, same rows") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    val l = spark.range(0, 400)
      .select((col("id") % 40L).as("k"), (col("id") * 3L).as("t"))
    val r = right
    val salted = TemporalJoins.asofSaltedLe(l, r, Seq("k"), Seq("rk"),
      "t", "rt", buckets = 25, hotThreshold = 1000L)
    val bare = l.join(r, expr("k = rk AND asof_le(t, rt)"), "left")
    assert(salted.count() == 400)
    assert(salted.select("k", "t", "rt").collect().map(_.toString).sorted.toSeq ==
      bare.select("k", "t", "rt").collect().map(_.toString).sorted.toSeq)
  }
}
