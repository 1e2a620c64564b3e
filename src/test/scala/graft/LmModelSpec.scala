package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scoring
import graft.streaming.Streams

/** Persisted bigram-LM model (`Scoring.writeLmModel` / `lmScoreFromModel` /
  * `Streams.streamLmScore`) — the maintenance/serving split of the
  * oracle-checked `lm_perplexity` query, mirroring `AnnIndexSpec`.
  * Pinned here: (a) serving the training corpus as probes is
  * row-identical to the in-memory query (training determinism + formula
  * identity); (b) the serving plan scans the documents table exactly once
  * (the probes) — everything else comes from the model parquet; (c) the
  * OOV generalization the in-corpus query never exercises: unseen
  * contexts score exactly 1/V per bigram; (d) micro-batched streaming
  * scoring replays to the same rows as the batch serving path.
  */
class LmModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))

  test("serving from the persisted model: identical results, probes-only documents scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-model").toString
    try {
      Scoring.writeLmModel(spark, sf, dir)
      val probes = Tables.documents(spark, sf).select("doc_id", "text")
      val served = Scoring.lmScoreFromModel(spark, dir, probes)

      val paths = SparkTestSession.scanPaths(served)
      val docScans = paths.filter(_.contains("documents.parquet"))
      assert(docScans.size == 2, // tf branch + the doc_id totality join
        s"serving plan scans documents ${docScans.size} times " +
          s"(want 2 probe reads, zero training reads): $paths")
      assert(paths.exists(_.endsWith("/c2")) && paths.exists(_.endsWith("/c1")),
        s"serving plan misses the model relations: $paths")

      // the serving path is deliberately unordered (no per-batch range
      // exchange for presentation order) — compare sorted
      val got = served.collect().map(key).toSeq.sortBy(_._1)
      val expected = Scoring.lmPerplexity(spark, sf).collect().map(key).toSeq
        .sortBy(_._1)
      assert(got.nonEmpty && got == expected,
        s"served (${got.size} rows) != in-memory (${expected.size} rows)")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("OOV probes score the add-k floor: unseen context = 1/V per bigram") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-oov").toString
    try {
      Scoring.writeLmModel(spark, sf, dir)
      val v = spark.read.parquet(s"$dir/meta").collect()(0).getLong(0).toDouble
      import spark.implicits._
      val probes = Seq((1L, "zzzz qqqq")).toDF("doc_id", "text")
      val row = Scoring.lmScoreFromModel(spark, dir, probes).collect()(0)
      assert(row.getLong(1) == 1L)
      // ln((0+0.5)/(0+0.5·V)) = −ln V
      assert(math.abs(row.getDouble(2) - (-math.log(v))) < 1e-3,
        s"OOV avg_logp ${row.getDouble(2)} != −ln($v)")
      assert(math.abs(row.getDouble(3) - v) < 0.02 + 0.01 * v,
        s"OOV ppl ${row.getDouble(3)} != $v")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("DSIR serving: model probes match the in-memory query; OOV gets the add-1 floor; stream replays") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-model").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-dsir-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dsir-ckpt").toString
    try {
      Scoring.writeDsirModel(spark, sf, dir)
      val ratios = spark.read.parquet(s"$dir/ratios")
      assert(ratios.count() == Scoring.DsirBuckets,
        "model must be dense: one row per possible bucket")
      val probes = Tables.documents(spark, sf).select("doc_id", "text")

      def dkey(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))
      val served = Scoring.dsirScoreFromModel(spark, dir, probes)
        .collect().map(dkey).sortBy(_._1)
      val inMem = Scoring.importanceWeights(spark, sf)
        .collect().map(dkey).sortBy(_._1)
      assert(served.length == inMem.length && served.zip(inMem).forall {
        case ((gi, gn, gw, gk), (wi, wn, ww, wk)) =>
          gi == wi && gn == wn && math.abs(gw - ww) < 1e-3 && gk == wk
      }, "served corpus probes must match the in-memory query")

      // OOV floor: a token the corpus never produced hashes to a bucket
      // whose ratio is ln((n_raw+B)/(n_tgt+B)) — the model must be total
      val oov = Scoring.dsirScoreFromModel(spark, dir,
        Seq((1L, "qqqqzz")).toDF("doc_id", "text")).collect()(0)
      assert(oov.getLong(1) == 1L, "OOV token must be counted, not dropped")

      // streaming twin: 3 micro-batches equal the batch serving path
      val docs = probes.collect().map(r => (r.getLong(0), r.getString(1)))
      val chunks = docs.grouped((docs.length + 2) / 3).toSeq
      val in = MemoryStream[(Long, String)]
      val (q, cached) = Streams.streamDsirScore(
        in.toDF().toDF("doc_id", "text"), spark, dir, outDir, ckpt)
      try {
        chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
        val streamed = spark.read.parquet(outDir)
          .select("doc_id", "n_toks", "log_w", "keep")
          .collect().map(dkey).toSet
        assert(streamed == served.toSet,
          s"stream-only: ${(streamed -- served.toSet).take(3)}")
      } finally { q.stop(); cached.unpersist(); () }
    } finally
      Seq(dir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
  }

  test("streaming LM scoring: micro-batched docs equal the batch serving path") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-stream").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-lm-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lm-ckpt").toString
    try {
      Scoring.writeLmModel(spark, sf, dir)
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(docs.length >= 3)
      val chunks = docs.grouped((docs.length + 2) / 3).toSeq
      val in = MemoryStream[(Long, String)]
      val (q, cached) = Streams.streamLmScore(
        in.toDF().toDF("doc_id", "text"), spark, dir, outDir, ckpt)
      try {
        chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
        val streamed = spark.read.parquet(outDir)
          .select("doc_id", "n_bigrams", "avg_logp", "ppl")
          .collect().map(key).toSet
        val batch = Scoring.lmScoreFromModel(spark, dir,
          Tables.documents(spark, sf).select("doc_id", "text"))
          .collect().map(key).toSet
        assert(streamed == batch,
          s"stream-only: ${(streamed -- batch).take(3)}; " +
            s"batch-only: ${(batch -- streamed).take(3)}")
      } finally {
        q.stop()
        cached.foreach(_.unpersist())
      }
    } finally
      Seq(dir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
  }
}
