package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.streaming.Streams

/** Persisted novelty model (`TextAnalysis.writeNoveltyModel` /
  * `noveltyScoreFromModel` / `Streams.streamNoveltyScore`) — the
  * maintenance/serving split of the oracle-checked `ngram_novelty` query,
  * mirroring `LmModelSpec`. Pinned here: (a) serving the training corpus
  * as probes reports ZERO unseen grams everywhere (every gram is in the
  * model by construction) and `rare_grams` identical to the in-corpus
  * query's `novel_grams`; (b) the serving plan reads documents only for
  * the probes — the model relation supplies history; (c) the unseen
  * generalization the in-corpus query never exercises: invented content
  * scores unseen_bp = 10000, empty content scores total zeros, neither
  * NULL; (d) micro-batched streaming scoring replays to the same rows as
  * the batch serving path.
  */
class NoveltyModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))

  test("serving the training corpus: zero unseen, rare == in-corpus novel, probes-only scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty-model").toString
    try {
      TextAnalysis.writeNoveltyModel(spark, sf, dir)
      val probes = Tables.documents(spark, sf).select("doc_id", "text")
      val served = TextAnalysis.noveltyScoreFromModel(spark, dir, probes)

      val paths = SparkTestSession.scanPaths(served)
      val docScans = paths.filter(_.contains("documents.parquet"))
      assert(docScans.size == 2, // gram branch + the doc_id totality join
        s"serving plan scans documents ${docScans.size} times " +
          s"(want 2 probe reads, zero training reads): $paths")
      assert(paths.exists(_.endsWith("/gramdf")),
        s"serving plan misses the model relation: $paths")

      val got = served.collect()
      assert(got.nonEmpty)
      got.foreach { r =>
        assert(r.getAs[Long]("unseen_grams") == 0L &&
          r.getAs[Long]("unseen_bp") == 0L,
          s"doc ${r.getAs[Long]("doc_id")}: training-corpus probe has unseen grams")
      }
      val rare = got.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_grams"), r.getAs[Long]("rare_grams"))).sortBy(_._1).toSeq
      val novel = TextAnalysis.ngramNovelty(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_grams"), r.getAs[Long]("novel_grams"))).toSeq
      assert(rare == novel,
        "served rare_grams must equal the in-corpus novel_grams on the training corpus")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("unseen generalization: invented content scores 10000 bp, empty content zero, never NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty-oov").toString
    try {
      TextAnalysis.writeNoveltyModel(spark, sf, dir)
      import spark.implicits._
      val probes = Seq(
        (1L, "zzzz qqqq xxxx"), // two invented bigrams
        (2L, ""),               // zero bigrams
        (3L, "wwww")            // one token, zero bigrams
      ).toDF("doc_id", "text")
      val rows = TextAnalysis.noveltyScoreFromModel(spark, dir, probes)
        .collect().map(key).sortBy(_._1)
      assert(rows.length == 3, "serving must be total over the probe batch")
      assert(rows(0) == (1L, 2L, 2L, 0L, 10000L), s"invented probe: ${rows(0)}")
      assert(rows(1) == (2L, 0L, 0L, 0L, 0L), s"empty probe: ${rows(1)}")
      assert(rows(2) == (3L, 0L, 0L, 0L, 0L), s"single-token probe: ${rows(2)}")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("streaming novelty scoring: micro-batched docs equal the batch serving path") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty-stream").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-novelty-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-novelty-ckpt").toString
    try {
      TextAnalysis.writeNoveltyModel(spark, sf, dir)
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(docs.length >= 3)
      val chunks = docs.grouped((docs.length + 2) / 3).toSeq
      val in = MemoryStream[(Long, String)]
      val (q, cached) = Streams.streamNoveltyScore(
        in.toDF().toDF("doc_id", "text"), spark, dir, outDir, ckpt)
      try {
        chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
        val streamed = spark.read.parquet(outDir)
          .select("doc_id", "n_grams", "unseen_grams", "rare_grams", "unseen_bp")
          .collect().map(key).toSet
        val batch = TextAnalysis.noveltyScoreFromModel(spark, dir,
          Tables.documents(spark, sf).select("doc_id", "text"))
          .collect().map(key).toSet
        assert(streamed == batch,
          s"stream-only: ${(streamed -- batch).take(3)}; " +
            s"batch-only: ${(batch -- streamed).take(3)}")
      } finally { q.stop(); cached.unpersist(); () }
    } finally
      Seq(dir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
  }
}
