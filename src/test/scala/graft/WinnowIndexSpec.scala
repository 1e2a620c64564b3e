package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** The winnow family's serving split: persisted fingerprint index +
  * batch/streaming screen. A synthetic three-doc corpus makes every
  * verdict deterministic: embedded-substring and exact-copy probes must
  * be flagged, novel text must score zero, and re-screening an indexed
  * doc under its own id must not self-match.
  */
class WinnowIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // three distinctive lowercase corpora, long enough to fingerprint
  private val corpus = Seq(
    (1L, ("the quick brown fox jumps over the lazy dog again and " * 8).trim),
    (2L, ("pack my box with five dozen liquor jugs every day now " * 8).trim),
    (3L, ("sphinx of black quartz judge my vow said the wizard oh " * 8).trim))

  private def writeCorpus(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow-corpus").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("srcX"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("winnow screen: embedded substring and exact copy flagged, novel and self clean") {
    import spark.implicits._
    val corpusDir = writeCorpus()
    val indexDir = java.nio.file.Files.createTempDirectory("graft-winnow-idx").toString
    try {
      operators.Dedup.writeWinnowIndex(spark, corpusDir, indexDir)
      val indexFps = spark.read.parquet(s"$indexDir/fps")
      assert(indexFps.count() > 0)
      val probes = Seq(
        // 200 chars of doc 1 embedded in novel text -> suspect
        (10L, "XQZW9 " * 10 + corpus.head._2.substring(0, 200) + " 8YVU" * 10),
        // entirely novel characters -> zero hits
        (11L, "K9Q2X7 J4M8Z1 " * 20),
        // the indexed doc itself under its own id -> self-guard, clean
        (1L, corpus.head._2),
        // exact copy of doc 2 under a new id -> suspect
        (12L, corpus(1)._2))
      val got = operators.Dedup.winnowScreenBatch(
        probes.toDF("doc_id", "text"), indexFps).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_index_hits"), r.getAs[Boolean]("suspect")))).toMap
      assert(got.size == 4, "screen must be total: every probe surfaces")
      assert(got(10L)._2 && got(10L)._1 >= 3, s"embedded substring: ${got(10L)}")
      assert(got(11L)._1 == 0L && !got(11L)._2, s"novel text: ${got(11L)}")
      assert(got(1L)._1 == 0L && !got(1L)._2, s"self re-screen: ${got(1L)}")
      assert(got(12L)._2, s"exact copy: ${got(12L)}")

      // streaming replay parity: same probes over 2 micro-batches
      implicit val ctx = spark.sqlContext
      val outDir = java.nio.file.Files.createTempDirectory("graft-winnow-out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-winnow-ck").toString
      val in = MemoryStream[(Long, String)]
      val (q, fps) = Streams.streamWinnowScreen(
        in.toDF().toDF("doc_id", "text"), spark, indexDir, outDir, ckpt)
      try {
        in.addData(probes.take(2)); q.processAllAvailable()
        in.addData(probes.drop(2)); q.processAllAvailable()
        val streamed = spark.read.parquet(outDir).collect()
          .map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[Long]("n_index_hits"), r.getAs[Boolean]("suspect")))).toMap
        assert(streamed == got, "stream/batch verdicts must replay identically")
      } finally {
        q.stop(); fps.unpersist()
        Seq(outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
      }
    } finally {
      Seq(corpusDir, indexDir).foreach(SparkTestSession.deleteRecursively)
    }
  }
}
