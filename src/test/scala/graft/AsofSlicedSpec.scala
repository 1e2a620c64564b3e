package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Build-side skew safety of the time-sliced as-of join
  * (`TemporalJoins.asofSlicedLe`) — the case `asofSaltedLe` deliberately
  * does not cover: one key whose RIGHT side carries 50× the median key's
  * history. The plain native exec sorts and merges that whole history on
  * one task; slicing the time axis splits it across (key, bucket)
  * clusters with a single carry-in row per bucket. Value parity is pinned
  * three ways: row-for-row against the bare native join here, the
  * brute-force ScalaCheck property in `AsofJoinProps` (random widths
  * force carry-across-boundary cases), and the shared DuckDB oracle of
  * `asof_join_sliced`.
  */
class AsofSlicedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Right-hot skew: key 0 has 5 000 quote rows over [0, 15000); 40 cold
    * keys have 100 each. Left: ~50 probes per key across the same range.
    */
  private def hotRight = {
    val hot = spark.range(0, 5000)
      .select(lit(0L).as("rk"), (col("id") * 3L).as("rt"))
    val cold = spark.range(0, 4000)
      .select((col("id") % 40L + 1L).as("rk"), (col("id") * 3L + 1L).as("rt"))
    hot.unionAll(cold)
  }
  private def probes = spark.range(0, 2050)
    .select((col("id") % 41L).as("k"), (col("id") * 7L % 15000L).as("t"))

  test("time slicing balances a 50x right-hot key; bare native exec does not") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val l = probes.cache(); val r = hotRight.cache()
      l.count(); r.count()

      val bare = l.join(r, expr("k = rk AND asof_le(t, rt)"), "left")
      // width 600 splits the hot key's 15000-wide history into 25 buckets
      val sliced = TemporalJoins.asofSlicedLe(l, r, Seq("k"), Seq("rk"),
        "t", "rt", sliceWidth = 600L)

      def key(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(x => (x.getLong(0), x.getLong(1),
          if (x.isNullAt(3)) -1L else x.getLong(3)))
        .sorted.toSeq
      val bareRows = bare.select("k", "t", "rk", "rt").collect()
      val slicedRows = sliced.select("k", "t", "rk", "rt").collect()
      assert(bareRows.length == 2050 && slicedRows.length == 2050,
        "as-of must emit exactly one row per left row")
      assert(key(slicedRows) == key(bareRows),
        "sliced and bare native as-of joins disagree")

      // straggler evidence: the bare exec's merge stage reads the hot
      // key's full history on one task
      val bareReads = TaskMetricsProbe.mergeStageTaskReads(spark) { bare.collect() }
      val bareMax = bareReads.max
      val bareMed = bareReads.sorted.apply(bareReads.size / 2).max(1L)
      assert(bareMax >= 4 * bareMed,
        s"expected a right-side straggler in the unsalted merge stage, " +
          s"got max=$bareMax median=$bareMed across ${bareReads.size} tasks")

      // the sliced plan still runs the native exec, clustered on
      // (key, bucket), and no task reads more than ~2x the median
      val slReads = TaskMetricsProbe.mergeStageTaskReads(spark) { sliced.collect() }
      assert(sliced.queryExecution.executedPlan.toString.contains("AsofJoin"),
        "sliced join no longer plans on the native exec")
      val slMax = slReads.max
      val slMed = slReads.sorted.apply(slReads.size / 2).max(1L)
      assert(slMax <= 2 * slMed,
        s"sliced merge stage still skewed: max=$slMax median=$slMed " +
          s"reads=${slReads.sorted.mkString(",")}")
      l.unpersist(); r.unpersist()
    } finally prev.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }

  test("carry-in across empty buckets: a probe far after the last quote still matches") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    // key 7: quotes only in bucket 0; probes in buckets 3 and 5 (gaps of
    // entirely empty buckets in between) must still find the bucket-0 row;
    // a probe BEFORE any quote gets the outer null
    val l = Seq((1L, 7L, 5L), (2L, 7L, 35L), (3L, 7L, 55L)).toDF("id", "k", "t")
    val r = Seq((7L, 6L, "early"), (7L, 8L, "late")).toDF("rk", "rt", "tag")
    val out = TemporalJoins.asofSlicedLe(l, r, Seq("k"), Seq("rk"),
        "t", "rt", sliceWidth = 10L)
      .select($"id", $"rt", $"tag").collect()
      .map(x => x.getAs[Long]("id") ->
        (Option(x.get(1)).map(_.asInstanceOf[Long]), x.getAs[String]("tag")))
      .toMap
    assert(out.size == 3)
    // probe at t=5: both quotes (rt=6, rt=8) are after it -> outer null
    assert(out(1L)._1.isEmpty, s"probe before any quote must be null, got ${out(1L)}")
    // probes in later, empty buckets ride the carry row (rt=8, 'late')
    assert(out(2L)._1.contains(8L) && out(2L)._2 == "late")
    assert(out(3L)._1.contains(8L) && out(3L)._2 == "late")
  }
}
