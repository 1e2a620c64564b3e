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
