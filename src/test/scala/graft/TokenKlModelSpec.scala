package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** The KL drift monitor's serving split: persisted corpus
  * token-distribution model + pooled per-batch scoring, batch and
  * streaming. Self-scoring must be near zero, novel-token batches must
  * spike, and the streamed per-batch rows must equal direct batch
  * recomputes.
  */
class TokenKlModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("token KL drift: self near zero, novel text spikes, stream replays batch") {
    import spark.implicits._
    val modelDir = java.nio.file.Files.createTempDirectory("graft-kl-model").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-kl-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kl-ck").toString
    try {
      operators.TextAnalysis.writeTokenKlModel(spark, sf, modelDir)
      val support = spark.read.parquet(s"$modelDir/support")
      val meta = spark.read.parquet(s"$modelDir/meta")
      assert(support.count() > 0 && meta.count() == 1)

      // self-score: the training corpus against its own model ~ 0
      val corpus = Tables.documents(spark, sf).select("doc_id", "text")
      val self = operators.TextAnalysis
        .tokenKlScoreBatch(corpus, support, meta).collect()(0)
      assert(self.getAs[Long]("n_docs") == corpus.count())
      val selfKl = self.getAs[Double]("kl_nats")
      assert(math.abs(selfKl) < 0.01, s"self KL should be ~0, got $selfKl")
      assert(self.getAs[Long]("in_support_bp") == 10000L,
        "training corpus must be fully covered by its own support")

      // an all-novel batch: coverage collapses to 0 bp, and the
      // over-support KL rises to KL(uniform || corpus) — strictly above
      // the self baseline (the fixture corpus is near-uniform over its
      // 31 tokens, so the spike is bounded; coverage is the loud signal)
      val drifted = Seq.tabulate(20)(i =>
        (5000L + i, s"QX7$i K9Z$i M4W$i " * 30)).toDF("doc_id", "text")
      val drift = operators.TextAnalysis
        .tokenKlScoreBatch(drifted, support, meta).collect()(0)
      val driftKl = drift.getAs[Double]("kl_nats")
      assert(drift.getAs[Long]("in_support_bp") == 0L,
        s"all-novel batch must show zero support coverage: $drift")
      assert(driftKl > selfKl + 0.05,
        s"novel batch must sit above the self baseline: self=$selfKl drifted=$driftKl")

      // streaming: one in-distribution batch, one drifted batch — each
      // row must equal the direct batch recompute
      implicit val ctx = spark.sqlContext
      val inDist = corpus.limit(50).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val driftRows = drifted.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val in = MemoryStream[(Long, String)]
      val (q, cached) = Streams.streamTokenKl(
        in.toDF().toDF("doc_id", "text"), spark, modelDir, outDir, ckpt)
      try {
        in.addData(inDist); q.processAllAvailable()
        in.addData(driftRows); q.processAllAvailable()
        // batch_id is partition-inferred (IntegerType for small ids) —
        // cast explicitly rather than lean on boxed cooperative equality
        val out = spark.read.parquet(outDir)
          .withColumn("batch_id",
            org.apache.spark.sql.functions.col("batch_id").cast("long"))
          .collect()
          .map(r => r.getAs[Long]("batch_id") ->
            ((r.getAs[Long]("n_docs"), r.getAs[Long]("in_support_bp"),
              r.getAs[Double]("kl_nats")))).toMap
        assert(out.size == 2)
        val want0 = operators.TextAnalysis.tokenKlScoreBatch(
          inDist.toDF("doc_id", "text"), support, meta).collect()(0)
        assert(out(0L) == ((want0.getAs[Long]("n_docs"),
          want0.getAs[Long]("in_support_bp"),
          want0.getAs[Double]("kl_nats"))), "batch 0 must replay exactly")
        assert(out(1L)._2 == 0L && out(1L)._3 > out(0L)._3,
          s"drifted stream batch must show coverage collapse + higher KL: $out")
      } finally {
        q.stop(); cached.foreach(_.unpersist())
      }
    } finally {
      Seq(modelDir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
    }
  }
}
