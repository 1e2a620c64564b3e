package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrain half of the persisted-ANN-index lifecycle
  * (`Similarity.retrainAnnIndex` / `annRetrainReport`) — the maintenance
  * action the drift telemetry calls for. Pinned here:
  *
  *  - file-level retrain on a GROWN index: appends folded with
  *    latest-wins, fresh codebook + full re-assign written under the
  *    staged-swap/manifest bracket, `retrains` bumped and `compactions`
  *    reset, and a probe in the appended direction served from the
  *    rebuilt base;
  *  - a no-append retrain is serve-identical to the original build
  *    (deterministic training on the same rows → same codebook → same
  *    cells), so retraining is always safe to run;
  *  - the shadow-retrain gain (`retrainFitFull`) separates the drifted
  *    and unbiased cohorts with margin on BOTH sides of the 2.0 flag —
  *    the property the `ann_retrain_report` verdict oracle rides on.
  */
class AnnRetrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def fixtureVec(id: Long): Array[Float] =
    Tables.embeddings(spark, sf).filter(col("vec_id") === id)
      .select("embedding").collect().head
      .getAs[scala.collection.Seq[Float]](0).toArray

  test("retrain on a grown index: appends folded, fresh codebook, manifest bumped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-retrain").toString
    try {
      import spark.implicits._
      operators.Similarity.writeAnnIndex(spark, sf, dir)
      val baseCount = spark.read.parquet(s"$dir/corpus").count()
      val codebook = operators.Similarity.codebookFromDir(spark, dir)
      // one compaction first, so the retrain's counter RESET is observable
      val v7 = fixtureVec(7L)
      operators.Similarity.annIndexAppendBatch(
        Seq((10001L, v7.toSeq)).toDF("vec_id", "embedding"), codebook, dir, 0L)
      operators.Similarity.compactAnnIndex(spark, dir)
      assert(models.ModelManifest.validate(spark, dir, "ann_ivf_index")
        .params.get("compactions").contains("1"))
      // grow again: a drifted direction (positive orthant, like the drift
      // report's shifted cohort) plus a re-ingest of 10001 — the upsert case
      val x = Array.fill(64)(1.0f)
      operators.Similarity.annIndexAppendBatch(
        Seq((10002L, x.toSeq)).toDF("vec_id", "embedding"), codebook, dir, 1L)
      val v7b = v7.clone(); v7b(0) = v7b(0) + 0.3f
      operators.Similarity.annIndexAppendBatch(
        Seq((10001L, v7b.toSeq)).toDF("vec_id", "embedding"), codebook, dir, 2L)

      operators.Similarity.retrainAnnIndex(spark, dir)

      val m = models.ModelManifest.validate(spark, dir, "ann_ivf_index")
      assert(m.params.get("retrains").contains("1"), s"params: ${m.params}")
      assert(!m.params.contains("compactions"),
        s"retrain must reset the fold audit: ${m.params}")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/appended")))
      val corpus = spark.read.parquet(s"$dir/corpus")
      assert(corpus.count() == baseCount + 2,
        "retrained corpus = base + two new ids (10001 upserted, not duplicated)")
      val kept = corpus.filter(col("vec_id") === 10001L)
        .select("embedding").collect()
        .map(_.getAs[scala.collection.Seq[Float]](0))
      assert(kept.length == 1 && kept.head.head == v7b(0),
        "retrain kept the LATEST batch's embedding for the re-ingested id")
      // the fresh codebook is what the manifest claims, and the rebuilt
      // base serves the appended direction without any appended/ tree
      val k = operators.Similarity.codebookFromDir(spark, dir).size
      assert(m.params.get("cells").contains(k.toString))
      val probe = Seq((20001L, x.toSeq)).toDF("vec_id", "embedding")
      val served = operators.Similarity.annFromIndex(spark, probe, dir)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
      assert(served.exists(r => r._1 == 10002L && r._2 == 1.0),
        s"retrained base must serve the formerly-appended vector: ${served.toSeq}")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("no-append retrain is serve-identical to the original build") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-retrain-id").toString
    try {
      operators.Similarity.writeAnnIndex(spark, sf, dir)
      val probes = Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 100 === 0)
        .select("vec_id", "embedding")
      def rows() = operators.Similarity.annFromIndex(spark, probes, dir)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
          r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
      val before = rows()
      operators.Similarity.retrainAnnIndex(spark, dir)
      assert(models.ModelManifest.validate(spark, dir, "ann_ivf_index")
        .params.get("retrains").contains("1"))
      val after = rows()
      assert(before.nonEmpty && after == before,
        s"deterministic retrain diverged: ${after.take(3)} vs ${before.take(3)}")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("shadow-retrain gain separates the cohorts with two-sided margin") {
    val rows = operators.Similarity.retrainFitFull(spark, sf)
      .collect().map(r => r.getAs[String]("cohort") -> r.getAs[Double]("gain"))
      .toMap
    assert(rows("shifted") > 2.0 * 1.2,
      s"a regime the codebook never saw must flag with margin: ${rows("shifted")}")
    assert(rows("unbiased") < 2.0 / 1.2,
      s"same-distribution arrivals must clear with margin: ${rows("unbiased")}")
  }
}
