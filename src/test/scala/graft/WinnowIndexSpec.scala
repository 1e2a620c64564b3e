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

  test("winnow grow: cross-batch quote caught, compaction re-applies the global hot cap") {
    import spark.implicits._
    val corpusDir = writeCorpus()
    val indexDir = java.nio.file.Files.createTempDirectory("graft-winnowg-idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-winnowg-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-winnowg-ck").toString
    try {
      operators.Dedup.writeWinnowIndex(spark, corpusDir, indexDir)
      val novel = ("w7xq jellyfish armada rides the violet comet stream " * 8).trim
      // 16 docs sharing one boilerplate paragraph (the hot-cap threshold),
      // each with unique filler — no single batch view can see B as hot
      val boiler = ("zqv9 boilerplate footer legal text shared verbatim " * 4).trim
      val boilerDocs = (40L until 56L).map(i =>
        (i, s"unique lead $i${('a' + (i % 26)).toChar.toString * 30} " + boiler))
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val (q, baseFps) = Streams.streamWinnowScreenGrow(
        in.toDF().toDF("doc_id", "text"), spark, indexDir, outDir, ckpt)
      try {
        in.addData(Seq((20L, novel)))
        q.processAllAvailable()
        in.addData(Seq(
          (21L, "QQ88 " * 8 + novel.substring(0, 200) + " RR99" * 8),
          (22L, "MM11 " * 8 + corpus.head._2.substring(0, 200) + " NN22" * 8),
          (23L, "B3V8K1 T6P2Y9 " * 20)))
        q.processAllAvailable()
        in.addData(boilerDocs)
        q.processAllAvailable()
        val got = spark.read.parquet(outDir).collect()
          .map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[Long]("n_index_hits"), r.getAs[Boolean]("suspect")))).toMap
        assert(got(20L) == ((0L, false)), s"batch-0 novel: ${got(20L)}")
        assert(got(21L)._2 && got(21L)._1 >= 3,
          s"cross-batch quote must be caught via index growth: ${got(21L)}")
        assert(got(22L)._2, s"base-history quote: ${got(22L)}")
        assert(got(23L) == ((0L, false)), s"batch-1 novel: ${got(23L)}")
        // pre-compaction: a boilerplate-only quoter IS flagged (per-batch
        // appends carry no hot cap — each batch saw B at most 16×, and
        // membership is what the grown screen joins on)
        val grownFps = baseFps.select("doc_id", "fp")
          .unionByName(spark.read.parquet(s"$indexDir/appended")
            .select("doc_id", "fp"))
        val probeB = Seq((60L, "novel intro words here " + boiler))
          .toDF("doc_id", "text")
        val pre = operators.Dedup.winnowScreenBatch(probeB, grownFps)
          .collect().head
        assert(pre.getAs[Boolean]("suspect"),
          s"pre-compaction boilerplate quote should hit the appends: $pre")
        // compaction folds the appends and re-applies the GLOBAL cap:
        // B's fingerprints now count 16 across the corpus and drop
        operators.Dedup.compactWinnowIndex(spark, indexDir)
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$indexDir/appended")))
        assert(models.ModelManifest.validate(spark, indexDir, "winnow_index")
          .params.get("compactions").contains("1"))
        val compacted = operators.Dedup.winnowIndexFps(spark, indexDir)
        val post = operators.Dedup.winnowScreenBatch(probeB, compacted)
          .collect().head
        assert(!post.getAs[Boolean]("suspect"),
          s"post-compaction: corpus-hot boilerplate must stop matching: $post")
        // non-hot growth still serves from the one compacted relation
        val post21 = operators.Dedup.winnowScreenBatch(
          Seq((61L, "XX77 " * 8 + novel.substring(0, 200) + " YY66" * 8))
            .toDF("doc_id", "text"), compacted).collect().head
        assert(post21.getAs[Boolean]("suspect"),
          s"post-compaction cross-batch quote: $post21")
        // idempotent when nothing new was appended
        operators.Dedup.compactWinnowIndex(spark, indexDir)
        assert(models.ModelManifest.validate(spark, indexDir, "winnow_index")
          .params.get("compactions").contains("1"))
      } finally { q.stop(); baseFps.unpersist() }
    } finally {
      Seq(corpusDir, indexDir, outDir, ckpt)
        .foreach(SparkTestSession.deleteRecursively)
    }
  }
}
