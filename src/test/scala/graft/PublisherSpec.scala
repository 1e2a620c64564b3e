package graft

import graft.sources.Sources
import graft.tools.Publisher
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EP3 end-to-end: the reference publisher's canonical fixture (3 users ×
  * 10 messages, 10 s apart, click=1 — `utils/message_publisher.py:113-116`)
  * through wire-format JSON → source → Demo2 window counts, against the
  * hand-computable expectation from FIXTURES.md §A4.
  */
class PublisherSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("publisher fixture through the pipeline yields the hand-computed counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pub").toString
    // end at 10:01:30 UTC → events at 10:00:00..10:01:30
    val end = java.time.Instant.parse("2024-01-01T10:01:30Z").getEpochSecond
    Publisher.publish(dir, Seq(1000, 1001, 1002), 10, end)

    val parsed = Sources.jsonLines(spark, dir, Tables.wireSchema)
      .filter(col("user_id").isNotNull)
      .select(timestamp_seconds(col("event_time")).as("event_time"), col("user_id"))
    val counts = graft.streaming.Streams.demo2WindowedCounts(parsed)
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getAs[Int]("user_id"), r.getAs[Long]("cnt"))).toSet

    val expected = (for (u <- Seq(1000, 1001, 1002)) yield Seq(
      ("2024-01-01 10:00:00.0", u, 6L), // :00 :10 :20 :30 :40 :50
      ("2024-01-01 10:01:00.0", u, 4L)  // :00 :10 :20 :30
    )).flatten.toSet
    assert(counts == expected, s"got $counts")
    // all clicks are 1 and every message parsed (30 total)
    val raw = Sources.jsonLines(spark, dir, Tables.wireSchema)
    assert(raw.count() == 30)
    assert(raw.agg(sum("click")).collect()(0).getLong(0) == 30L)
  }

  test("Demo1/Demo2 pipeline mains: publisher → file stream → parquet sink") {
    val in = java.nio.file.Files.createTempDirectory("graft_demo_in").toString
    val end = java.time.Instant.parse("2024-01-01T10:01:30Z").getEpochSecond
    Publisher.publish(in, Seq(1000, 1001, 1002), 10, end)

    val out1 = java.nio.file.Files.createTempDirectory("graft_demo1_out").toString
    val ck1 = java.nio.file.Files.createTempDirectory("graft_demo1_ck").toString
    val q1 = graft.tools.Demo1.build(spark, in, out1, ck1)
    try q1.processAllAvailable() finally q1.stop()
    val d1 = spark.read.parquet(out1)
    assert(d1.count() == 30)
    assert(d1.columns.toSet ==
      Set("event_time", "processing_time", "user_id", "click"))

    val out2 = java.nio.file.Files.createTempDirectory("graft_demo2_out").toString
    val ck2 = java.nio.file.Files.createTempDirectory("graft_demo2_ck").toString
    val q2 = graft.tools.Demo2.build(spark, in, out2, ck2)
    try q2.processAllAvailable() finally q2.stop()
    // append mode: with a single batch the watermark never advances past the
    // window ends, so the sink may legitimately be empty — drop a second,
    // later file to advance the watermark and drain again
    Publisher.publish(in, Seq(1000), 1, end + 600)
    val q2b = graft.tools.Demo2.build(spark, in, out2, ck2)
    try q2b.processAllAvailable() finally q2b.stop()
    val d2 = spark.read.parquet(out2)
    val counts = d2.collect().map(r => (r.getAs[Int]("user_id"), r.getAs[Long]("cnt")))
    assert(counts.count { case (u, c) => u >= 1000 && u <= 1002 && c == 6L } == 3,
      s"expected three 6-count windows, got ${counts.toSeq}")
  }

  test("deferred pipeline options resolve at launch (O13 ValueProvider parity)") {
    assert(graft.tools.Demos.resolve("/literal/path") == "/literal/path")
    // PATH is set in any environment this suite runs in
    assert(graft.tools.Demos.resolve("env:PATH") == sys.env("PATH"))
    val e = intercept[IllegalArgumentException](
      graft.tools.Demos.resolve("env:GRAFT_SURELY_UNSET_OPTION"))
    assert(e.getMessage.contains("unset at launch"))
  }
}
