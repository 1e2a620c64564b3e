package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Incremental ANN index (`Similarity.annIndexAppendBatch` /
  * `annFromIndexGrown` / `compactAnnIndex` + `Streams.streamAnnIngest`) —
  * the vector twin of the edit-screen grow/compact lifecycle: arriving
  * vectors are appended under the FROZEN codebook, serving sees base ∪
  * appends with latest-wins per vec_id, and offline compaction folds the
  * appends into the base with global upsert semantics.
  */
class AnnGrowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def fixtureVec(id: Long): Array[Float] =
    Tables.embeddings(spark, sf).filter(col("vec_id") === id)
      .select("embedding").collect().head
      .getAs[scala.collection.Seq[Float]](0).toArray

  private def topFor(df: org.apache.spark.sql.DataFrame, qid: Long) =
    df.filter(col("qid") === qid).orderBy("rank").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq

  test("grow lifecycle: appends serve, latest wins, compaction upserts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-grow").toString
    try {
      import spark.implicits._
      operators.Similarity.writeAnnIndex(spark, sf, dir)
      val baseCount = spark.read.parquet(s"$dir/corpus").count()
      val codebook = operators.Similarity.codebookFromDir(spark, dir)
      val v7 = fixtureVec(7L)
      val v8 = fixtureVec(8L)
      // batch 0: two arrivals — an exact copy of corpus vector 7 and one
      // of vector 8, under fresh ids
      operators.Similarity.annIndexAppendBatch(
        Seq((10001L, v7.toSeq), (10002L, v8.toSeq)).toDF("vec_id", "embedding"),
        codebook, dir, 0L)
      // batch 1 RE-INGESTS 10001 with a perturbed embedding (first
      // component nudged) — the upsert case
      val v7b = v7.clone(); v7b(0) = v7b(0) + 0.3f
      // premise guard: the perturbed vector must stay in v7's cell, or
      // the latest-wins assertion below would be vacuous
      val cellOf = (v: Array[Float]) =>
        operators.Similarity.annScreenGrownBatch(
          Seq((99L, v.toSeq)).toDF("vec_id", "embedding"), codebook, dir, -1L)
          .select("cell").collect().head.getInt(0)
      assert(cellOf(v7) == cellOf(v7b), "fixture premise: perturbed v7 changed cell")
      operators.Similarity.annIndexAppendBatch(
        Seq((10001L, v7b.toSeq)).toDF("vec_id", "embedding"), codebook, dir, 1L)

      // probe = v7's direction: the grown serve must surface the arrival
      // 10001 (latest embedding, cosine < 1) and the stale serve must not
      // see 10001 at all
      val probe = Seq((20001L, v7.toSeq)).toDF("vec_id", "embedding")
      val grown = operators.Similarity.annFromIndexGrown(spark, probe, dir)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
      val hit10001 = grown.filter(_._1 == 10001L)
      assert(hit10001.length == 1, s"latest-wins dedup: $grown")
      assert(hit10001.head._2 < 1.0,
        s"batch-1 embedding must win over the batch-0 exact copy: $grown")
      assert(grown.exists(r => r._1 == 7L && r._2 == 1.0),
        s"base corpus still served: $grown")
      val stale = operators.Similarity.annFromIndex(spark, probe, dir)
        .collect().map(_.getAs[Long]("vec_id"))
      assert(!stale.contains(10001L), "stale index must not see appends")

      // compaction: appended tree folded in with global latest-wins
      operators.Similarity.compactAnnIndex(spark, dir)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/appended")))
      val m = models.ModelManifest.validate(spark, dir, "ann_ivf_index")
      assert(m.params.get("compactions").contains("1"))
      val corpus = spark.read.parquet(s"$dir/corpus")
      assert(corpus.count() == baseCount + 2,
        "compacted corpus = base + two new ids (10001 upserted, not duplicated)")
      val kept = corpus.filter(col("vec_id") === 10001L)
        .select("embedding").collect()
        .map(_.getAs[scala.collection.Seq[Float]](0))
      assert(kept.length == 1 && kept.head.head == v7b(0),
        "compaction kept the LATEST batch's embedding")
      // post-compaction serve matches the pre-compaction grown serve
      val after = operators.Similarity.annFromIndex(spark, probe, dir)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
      assert(after.toSeq == grown.toSeq,
        s"post-compaction serve diverged: $after vs $grown")
      // cell partitioning survives compaction: one-cell read prunes
      val cells = corpus.select("cell").distinct().count()
      val one = spark.read.parquet(s"$dir/corpus")
        .filter(col("cell") === cellOf(v7))
      val scan = one.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scan.nonEmpty && scan.head.selectedPartitions.partitionCount == 1,
        s"compacted corpus lost cell pruning ($cells cells)")
      // idempotent when nothing new was appended
      operators.Similarity.compactAnnIndex(spark, dir)
      assert(models.ModelManifest.validate(spark, dir, "ann_ivf_index")
        .params.get("compactions").contains("1"))
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("streaming ingest: a near-dup of a vector first seen in a PRIOR batch is caught") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-ing-idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-ann-ing-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-ing-ck").toString
    try {
      import spark.implicits._
      operators.Similarity.writeAnnIndex(spark, sf, dir)
      val codebook = operators.Similarity.codebookFromDir(spark, dir)
      // X: a direction no fixture vector is near (all-ones); XC: a near
      // copy of X; C3: an exact copy of corpus vector 3
      val x = Array.fill(64)(1.0f)
      val xc = x.clone(); xc(0) = 1.2f
      val c3 = fixtureVec(3L)
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[(Long, Seq[Float])]
      val q = Streams.streamAnnIngest(
        in.toDF().toDF("vec_id", "embedding"), spark, dir, outDir, ckpt)
      try {
        in.addData(Seq((30001L, x.toSeq)))
        q.processAllAvailable()
        in.addData(Seq((30002L, xc.toSeq), (30003L, c3.toSeq)))
        q.processAllAvailable()
        val screened = spark.read.parquet(outDir)
        // cross-batch: XC's best neighbor is X — visible only via growth
        val xcTop = topFor(screened, 30002L)
        assert(xcTop.nonEmpty && xcTop.head._1 == 30001L && xcTop.head._2 > 0.99,
          s"cross-batch near-dup must surface the batch-0 vector: $xcTop")
        // frozen-index history still screens: C3 hits corpus id 3 at 1.0
        val c3Top = topFor(screened, 30003L)
        assert(c3Top.nonEmpty && c3Top.head == ((3L, 1.0)),
          s"base-history dup: $c3Top")
        // batch 0 saw only the base corpus (nothing from its own batch)
        val xTop = topFor(screened, 30001L)
        assert(xTop.forall(_._1 < 30000L), s"batch-0 screen leaked growth: $xTop")
        // redelivery-shaped rerun of batch 1's screen: own-batch rows
        // excluded, prior batches visible — byte-identical verdicts
        val again = operators.Similarity.annScreenGrownBatch(
          Seq((30002L, xc.toSeq), (30003L, c3.toSeq)).toDF("vec_id", "embedding"),
          codebook, dir, excludeBatch = 1L)
        assert(topFor(again, 30002L) == xcTop && topFor(again, 30003L) == c3Top,
          "redelivered screen must replay batch-1 verdicts identically")
      } finally q.stop()
    } finally Seq(dir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
  }

  test("streaming drift monitor: in-distribution batch quiet, orthant-shifted batch flagged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-drift-idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-ann-drift-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-drift-ck").toString
    try {
      import spark.implicits._
      operators.Similarity.writeAnnIndex(spark, sf, dir)
      val arrivals = Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 3 === 0).select("vec_id", "embedding")
        .collect()
        .map(r => (r.getAs[Long](0), r.getAs[scala.collection.Seq[Float]](1).toSeq))
        .toSeq
      val shifted = arrivals.map { case (id, v) => (id + 50000L, v.map(math.abs)) }
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[(Long, Seq[Float])]
      val (q, cached) = Streams.streamAnnDriftMonitor(
        in.toDF().toDF("vec_id", "embedding"), spark, dir, outDir, ckpt)
      try {
        in.addData(arrivals); q.processAllAvailable()
        in.addData(shifted); q.processAllAvailable()
        val got = spark.read.parquet(outDir).collect()
          .map(r => r.getAs[Int]("batch_id") ->
            ((r.getAs[Long]("n_arrivals"), r.getAs[Double]("tv"),
              r.getAs[Boolean]("drift_flagged"),
              r.getAs[Double]("fit_ratio")))).toMap
        assert(got.size == 2, s"one verdict row per batch: $got")
        assert(got(0)._1 == arrivals.size && !got(0)._3 && got(0)._2 < 0.15,
          s"in-distribution batch must stay quiet: ${got(0)}")
        assert(got(1)._1 == arrivals.size && got(1)._3 && got(1)._2 > 0.3,
          s"orthant-shifted batch must flag: ${got(1)}")
        // fit-ratio telemetry rides the same verdict row: an
        // in-distribution batch sits at ~1.0 (it IS the training data's
        // regime), the unseen regime strictly above it
        assert(got(0)._4 < 1.1 && got(1)._4 > got(0)._4,
          s"fit telemetry must order the batches: ${got(0)._4} vs ${got(1)._4}")
      } finally { q.stop(); cached.unpersist() }
    } finally Seq(dir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
  }

  test("drift cohorts separate and grow-serve verdicts hold on the fixture") {
    val drift = operators.Similarity.annIndexDriftFull(spark, sf).collect()
      .map(r => r.getAs[String]("cohort") ->
        ((r.getAs[Boolean]("drift_flagged"), r.getAs[Double]("tv")))).toMap
    assert(drift("shifted")._1 && drift("shifted")._2 > 0.3,
      s"orthant-shifted arrivals must flag: $drift")
    assert(!drift("unbiased")._1 && drift("unbiased")._2 < 0.15,
      s"same-distribution arrivals must not flag: $drift")
    val g = operators.Similarity.annGrowServeFull(spark, sf)
      .select("grown_hits", "stale_hits", "nq").limit(1).collect().head
    val (grown, stale, nq) =
      (g.getAs[Long]("grown_hits"), g.getAs[Long]("stale_hits"), g.getAs[Long]("nq"))
    assert(grown >= stale, s"superset monotonicity: grown=$grown stale=$stale")
    assert(grown > stale, s"fixture margin: appends add recall (grown=$grown stale=$stale)")
    // the k-aware floor (GrowRecallCoeff/sqrt(k)) at the fixture's true
    // k = 8 is 0.141 (the coefficient's scaladoc records the re-fit
    // after the seeding fix); referencing the shared constant keeps this
    // assertion synchronized with the verdict the oracle enforces
    assert(grown.toDouble / (3 * nq) >=
      operators.Similarity.GrowRecallCoeff / math.sqrt(8),
      s"recall floor: $grown/$nq")
  }
}
