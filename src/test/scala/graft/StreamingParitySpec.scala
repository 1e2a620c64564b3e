package graft

import graft.streaming.Streams
import graft.streaming.Streams.Msg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Deeper streaming semantics: accumulating (Update-mode) panes, streaming
  * dedup, and stream↔batch result parity on the real events fixture.
  */
class StreamingParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("update mode = Beam accumulating panes: re-emits growing counts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Msg]
    val q = Streams.demo2WindowedCounts(in.toDF())
      .writeStream.format("memory").queryName("demo2_upd")
      .outputMode("update").start()
    try {
      in.addData(Msg(ts("2024-01-01 10:00:05"), 1), Msg(ts("2024-01-01 10:00:15"), 1))
      q.processAllAvailable()
      in.addData(Msg(ts("2024-01-01 10:00:30"), 1))
      q.processAllAvailable()
      val counts = spark.table("demo2_upd")
        .filter(col("user_id") === 1).collect().map(_.getAs[Long]("cnt")).sorted
      // pane 1: count 2; pane 2 (same window, accumulating): count 3
      assert(counts.toSeq == Seq(2L, 3L), s"got ${counts.toSeq}")
    } finally q.stop()
  }

  test("streaming dedup drops within-horizon duplicates, keeps state bounded") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    case class Ev(ts: Timestamp, event_id: Long)
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "event_id")
    val q = Streams.streamingDedup(df, "ts", "10 minutes", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:01"), 2L))
      q.processAllAvailable()
      // duplicate id 1 within the horizon: dropped
      in.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:05"), 3L))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups an id even at a different event time") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "event_id")
    val q = Streams.streamingDedupWithinWatermark(df, "ts", "10 minutes", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:01"), 2L))
      q.processAllAvailable()
      // id 1 again at a DIFFERENT event time, within the watermark delay of
      // the first sighting: still a duplicate under this API (the classic
      // dropDuplicates would keep it because ts differs)
      in.addData((ts("2024-01-01 10:00:30"), 1L), (ts("2024-01-01 10:00:05"), 3L))
      q.processAllAvailable()
      val ids = spark.table("dedup_wm_out").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("demo2 state on RocksDB state store: same results, scalable state") {
    // HDFS-backed state store holds state in executor heap; RocksDB spills
    // to local disk — the provider a 100 TB streaming job would run with.
    // Same transform, same results, only the provider conf differs.
    import org.apache.spark.sql.SparkSession
    import spark.implicits._
    val _ = spark
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = try SparkSession.builder()
      .master("local[2]")
      .appName("graft-rocksdb-test")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
    implicit val ctx = s2.sqlContext
    val in = MemoryStream[Msg]
    val q = Streams.demo2WindowedCounts(in.toDF())
      .writeStream.format("memory").queryName("demo2_rocks")
      .outputMode("update").start()
    try {
      in.addData(Msg(ts("2024-01-01 10:00:05"), 1), Msg(ts("2024-01-01 10:00:15"), 1))
      q.processAllAvailable()
      in.addData(Msg(ts("2024-01-01 10:00:30"), 1))
      q.processAllAvailable()
    } finally q.stop()
    val counts = s2.table("demo2_rocks")
      .filter(col("user_id") === 1).collect().map(_.getAs[Long]("cnt")).sorted
    assert(counts.toSeq == Seq(2L, 3L), s"got ${counts.toSeq}")
  }

  test("stream replay of the events fixture matches the batch flagship result") {
    // Stream the sf0.001 events parquet through the same transform used by
    // the batch flagship; in append mode only windows the final watermark
    // passed are emitted — those must match the batch result exactly.
    val batchEvents = Tables.events(spark, sf)
    // the file source wants a directory; stage the CANONICAL events frame
    // (Tables.events already normalized ts to TimestampType whatever the
    // fixture generation wrote), so the streamed side needs no per-format
    // conversion of its own
    val stageDir = java.nio.file.Files.createTempDirectory("graft_replay")
    batchEvents.write.mode("overwrite").parquet(stageDir.toString)
    val stream = graft.sources.Sources.parquetStream(
        spark, stageDir.toString, batchEvents.schema)
      .select(col("ts").as("event_time"), col("user_id"))
    val q = Streams.demo2WindowedCounts(stream)
      .writeStream.format("memory").queryName("parity_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val maxTs = batchEvents.agg(max("ts")).collect()(0).getTimestamp(0).getTime
    val horizonMs = 2 * 60000L
    val batch = graft.operators.BeamParity.demo2WindowCount(spark, sf)
      // keep windows whose end the final watermark passed
      .filter((col("window_start_s") + 60) * 1000 <= lit(maxTs - horizonMs))
      .collect().map(r => (r.getAs[Long]("window_start_s"),
        r.getAs[Long]("user_id"), r.getAs[Long]("cnt"))).toSet
    val streamed = spark.table("parity_out").collect()
      .map(r => (r.getAs[Timestamp]("window_start").getTime / 1000,
        r.getAs[Long]("user_id"), r.getAs[Long]("cnt"))).toSet
    assert(batch.nonEmpty)
    assert(batch.subsetOf(streamed),
      s"batch windows missing from stream: ${(batch -- streamed).take(5)}")
    SparkTestSession.deleteRecursively(stageDir.toString)
  }
}
