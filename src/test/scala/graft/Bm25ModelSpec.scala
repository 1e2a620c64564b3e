package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scoring
import graft.streaming.Streams

/** Persisted BM25 model (`Scoring.writeBm25Model` / `bm25ScoreFromModel` /
  * `Streams.streamBm25Score`) — the maintenance/serving split of the
  * oracle-checked `bm25_topk` query, closing the last selector without
  * one (LM and DSIR split in round 9). Pinned here: (a) serving the
  * training corpus as probes reproduces the in-corpus query's ranking
  * exactly (statistics + formula identity through the shared tail);
  * (b) the serving plan scans the documents table exactly once (the
  * probes) — statistics come from the model parquet; (c) OOV semantics:
  * a query term outside the model vocabulary contributes nothing, a
  * probe document with no query terms emits no row; (d) micro-batched
  * streaming scoring replays to the same rows as batch serving.
  */
class Bm25ModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getDouble(1), r.getLong(2))

  test("serving from the persisted model: identical top-k, probes-only documents scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-model").toString
    try {
      Scoring.writeBm25Model(spark, sf, dir)
      val probes = Tables.documents(spark, sf).select("doc_id", "text")
      val served = Scoring.bm25ScoreFromModel(spark, dir, probes)

      val paths = SparkTestSession.scanPaths(served)
      val docScans = paths.filter(_.contains("documents.parquet"))
      assert(docScans.size == 1,
        s"serving plan scans documents ${docScans.size} times " +
          s"(want 1 probe read, zero training reads): $paths")
      assert(paths.exists(_.endsWith("/df")) && paths.exists(_.endsWith("/meta")),
        s"serving plan misses the model relations: $paths")

      // serving is unordered; the in-corpus query adds sort + limit 15 —
      // apply the same presentation to the served frame and compare rows
      val got = served
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(15)
        .collect().map(key).toSeq
      val expected = Scoring.bm25Topk(spark, sf).collect().map(key).toSeq
      assert(got.nonEmpty && got == expected,
        s"served top-15 != in-corpus query\nserved:   $got\nexpected: $expected")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("OOV pinned: out-of-model terms contribute nothing; no-term probes emit no row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-oov").toString
    try {
      Scoring.writeBm25Model(spark, sf, dir)
      import spark.implicits._
      val probes = Seq(
        (1L, "zzzzoov zzzzoov zzzzoov"), // only OOV terms
        (2L, "join zzzzoov"))            // one in-model query term + one OOV
        .toDF("doc_id", "text")
      val rows = Scoring.bm25ScoreFromModel(spark, dir, probes,
        terms = Seq("join", "zzzzoov")).collect()
      assert(rows.map(_.getLong(0)).toSet == Set(2L),
        "a probe with no in-model query terms must emit no row")
      val r2 = rows.find(_.getLong(0) == 2L).get
      assert(r2.getLong(2) == 1L,
        s"OOV term must not count toward n_terms: ${r2.getLong(2)}")
      assert(r2.getDouble(1) > 0.0, "the in-model term must still score")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("streaming BM25 scoring: micro-batched docs equal the batch serving path") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-stream").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-bm25-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bm25-ckpt").toString
    try {
      Scoring.writeBm25Model(spark, sf, dir)
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(docs.length >= 3)
      val chunks = docs.grouped((docs.length + 2) / 3).toSeq
      val in = MemoryStream[(Long, String)]
      val (q, cached) = Streams.streamBm25Score(
        in.toDF().toDF("doc_id", "text"), spark, dir, outDir, ckpt)
      try {
        chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
        val streamed = spark.read.parquet(outDir)
          .select("doc_id", "bm25", "n_terms")
          .collect().map(key).toSet
        val batch = Scoring.bm25ScoreFromModel(spark, dir,
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
