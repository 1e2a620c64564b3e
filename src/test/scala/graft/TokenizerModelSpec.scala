package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.streaming.Streams

/** Persisted tokenizer artifacts (`writeBpeMerges` / `writeVocabModel`) —
  * merges and vocabulary treated as model artifacts like the LM/DSIR/BM25
  * statistics: trained once, bounded (≤20 merge rows, K vocab rows),
  * served batch and streaming without rescanning the training corpus.
  * Pinned here: (a) applying the persisted merges to the training corpus
  * reproduces the oracle-checked `bpe_apply_merges` rows exactly;
  * (b) coverage from the persisted vocabulary on the training corpus
  * equals the in-corpus `vocab_coverage` query; (c) an OOV probe under
  * the frozen vocabulary is counted, not dropped; (d) streaming per-batch
  * coverage reports are additive to the batch totals.
  */
class TokenizerModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("persisted BPE merges serve the batch query's rows exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-model").toString
    try {
      TextAnalysis.writeBpeMerges(spark, sf, dir)
      val merges = TextAnalysis.bpeMergesFromModel(spark, dir)
      assert(merges.nonEmpty && merges.size <= 20)
      // rank order must reproduce the training-time ordering exactly —
      // merge application is order-sensitive
      val trained = TextAnalysis.bpePairCounts(spark, sf)
        .collect().map(_.getString(0)).toSeq
      assert(merges == trained, "model order != training order")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          Option(r.getString(4)))
      val served = TextAnalysis.bpeApplyFrozen(
        Tables.documents(spark, sf).select("doc_id", "text"), merges)
        .collect().map(key).toSet
      val batch = TextAnalysis.bpeApplyMerges(spark, sf).collect().map(key).toSet
      assert(served == batch)
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("frozen vocabulary: training-corpus coverage identical, OOV probes counted, stream additive") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-vocab-model").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-vocab-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vocab-ckpt").toString
    try {
      TextAnalysis.writeVocabModel(spark, sf, dir)
      assert(spark.read.parquet(s"$dir/vocab").count() <= TextAnalysis.VocabTopK)
      def key(r: org.apache.spark.sql.Row) =
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val probes = Tables.documents(spark, sf).select("source", "text")
      val served = TextAnalysis.vocabCoverageFromModel(spark, dir, probes)
        .collect().map(key).toMap
      val inCorpus = TextAnalysis.vocabCoverage(spark, sf)
        .collect().map(key).toMap
      assert(served == inCorpus,
        "frozen-vocab serving on the training corpus must equal the in-corpus query")

      // OOV probe: every token out-of-vocabulary → zero coverage, counted
      val oov = TextAnalysis.vocabCoverageFromModel(spark, dir,
        Seq(("sX", "zzqq zzqq wwvv")).toDF("source", "text")).collect()
      assert(oov.length == 1 && oov(0).getLong(1) == 3L &&
        oov(0).getLong(2) == 0L && oov(0).getLong(3) == 10000L &&
        oov(0).getLong(4) == 2L,
        s"OOV probe report wrong: ${oov.toSeq}")

      // streaming: per-batch reports are additive to the batch totals
      val docs = probes.collect().map(r => (r.getString(0), r.getString(1)))
      val chunks = docs.grouped((docs.length + 2) / 3).toSeq
      val in = MemoryStream[(String, String)]
      val (q, vocab) = Streams.streamVocabCoverage(
        in.toDF().toDF("source", "text"), spark, dir, outDir, ckpt)
      try {
        chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
        val summed = spark.read.parquet(outDir)
          .groupBy("source")
          .agg(sum("n_tokens").as("n"), sum("covered_tokens").as("c"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        val batchTotals = inCorpus.map { case (s, (n, c, _, _)) => s -> (n, c) }
        assert(summed == batchTotals,
          s"summed stream reports != batch totals\n$summed\n$batchTotals")
      } finally { q.stop(); vocab.unpersist(); () }
    } finally
      Seq(dir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
  }
}
