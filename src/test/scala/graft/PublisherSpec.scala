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
}
