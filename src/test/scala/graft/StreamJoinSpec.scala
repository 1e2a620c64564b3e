package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming joins — stream↔static enrichment and watermarked
  * stream↔stream equi-join with an event-time bound (the remaining
  * stateful-op surface of SURVEY.md §2.2).
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-static join: events enriched against a broadcast dimension") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val in = MemoryStream[(Timestamp, Long)]
    val q = in.toDF().toDF("ts", "user_id")
      .join(broadcast(dim), Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:01"), 999999L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enrich_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("c_mktsegment"))).toMap
    assert(rows(1L) != null, "known key enriched")
    assert(rows.contains(999999L) && rows(999999L) == null, "unknown key kept with null dim")
  }

  test("stream-static as-of: each streamed fact enriched by its latest prior quote") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    // static quotes: per-key rate revisions over time
    val quotes = Seq((10L, 100L, 1.0), (10L, 200L, 2.0), (20L, 150L, 9.0))
      .toDF("rk", "rt", "rate")
    val in = MemoryStream[(Long, Long)] // (key, t)
    val q = in.toDF().toDF("k", "t")
      .join(broadcast(quotes), expr("k = rk AND asof_le(t, rt)"), "left")
      .select($"k", $"t", $"rate")
      .writeStream.format("memory").queryName("asof_stream_out")
      .outputMode("append").start()
    try {
      in.addData((10L, 150L), (10L, 250L), (20L, 100L), (99L, 500L))
      q.processAllAvailable()
      // a later micro-batch re-plans the same join — same static snapshot
      in.addData((10L, 199L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("asof_stream_out").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("t")) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(rows((10L, 150L)).contains(1.0)) // after first revision only
    assert(rows((10L, 250L)).contains(2.0)) // after the second
    assert(rows((10L, 199L)).contains(1.0)) // second micro-batch, same result
    assert(rows((20L, 100L)).isEmpty)       // before the key's first quote
    assert(rows((99L, 500L)).isEmpty)       // unknown key
  }

  test("stream-stream join: clicks within 5 minutes of an impression") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val impressions = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val imp = impressions.toDF().toDF("imp_ts", "ad_id")
      .withWatermark("imp_ts", "10 minutes")
    val clk = clicks.toDF().toDF("click_ts", "ad_id")
      .withWatermark("click_ts", "10 minutes")
    val joined = imp.as("imp").join(clk.as("clk"),
      col("imp.ad_id") === col("clk.ad_id") &&
        col("clk.click_ts") >= col("imp.imp_ts") &&
        col("clk.click_ts") <= col("imp.imp_ts") + expr("interval 5 minutes"))
    val q = joined.select(col("imp.ad_id").as("ad_id"), col("imp_ts"), col("click_ts"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      impressions.addData((ts("2024-01-01 10:00:00"), 7L), (ts("2024-01-01 10:00:00"), 8L))
      clicks.addData(
        (ts("2024-01-01 10:03:00"), 7L), // within 5 min → match
        (ts("2024-01-01 10:09:00"), 8L)) // beyond 5 min → no match
      q.processAllAvailable()
    } finally q.stop()
    val matched = spark.table("ssj_out").collect().map(_.getAs[Long]("ad_id")).toSeq
    assert(matched == Seq(7L), s"got $matched")
  }
}
