package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.Streams

/** Persisted semantic-dedup screen (`Similarity.writeSemdedupIndex` /
  * `semdedupScreenFromModel` / `Streams.streamSemdedupScreen`) — the
  * maintenance/serving split of the `semdedup_prune` family, mirroring
  * `AnnIndexSpec`. Pinned here: (a) the index is duplicate-free by the
  * keep rule, so re-screening the kept members against it (self-matches
  * excluded) reports CLEAN everywhere; (b) dropped members that the
  * prune attributed to a kept dominator flag as duplicates — and the
  * screen agrees with a brute-force cosine check against the kept set;
  * (c) the serving plan reads only the probed cells of the kept
  * partitioning and never the embeddings table beyond the probes;
  * (d) micro-batched streaming screening replays to the same rows as
  * the batch serving path.
  */
class SemdedupIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("kept members re-screen clean; brute-force agreement on every probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup-index").toString
    try {
      Similarity.writeSemdedupIndex(spark, sf, dir)
      val kept = spark.read.parquet(s"$dir/kept").collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray,
          r.getAs[Double]("nrm"), r.getAs[Int]("cell")))
      assert(kept.nonEmpty)

      val probes = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      val screened = Similarity.semdedupScreenFromModel(spark, dir, probes)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Long]("n_dup_kept"), r.getAs[Boolean]("is_dup"))).toMap
      assert(screened.size == probes.count(), "screen must be total over probes")

      val keptIds = kept.map(_._1).toSet
      keptIds.foreach { id =>
        assert(!screened(id)._2,
          s"kept member $id flagged as duplicate of the kept set — index not dup-free")
      }
      // brute force: a probe's matches = kept members of ITS cell within
      // the threshold. Probe cells recomputed from the persisted codebook.
      val codebook = spark.read.parquet(s"$dir/codebook").orderBy("cell").collect()
        .map(r => (r.getAs[Int]("cell"), r.getAs[Seq[Float]]("centroid").toArray))
      val all = Tables.embeddings(spark, sf).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray))
      def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
      def rawCos(a: Array[Float], na: Double, b: Array[Float], nb: Double) =
        a.zip(b).map { case (x, y) => x.toDouble * y }.sum / (na * nb)
      def cos(a: Array[Float], na: Double, b: Array[Float], nb: Double) =
        BigDecimal(rawCos(a, na, b, nb))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      var dupSeen = false
      all.foreach { case (id, emb) =>
        val n = norm(emb)
        val expect =
          if (n == 0) 0L
          else {
            // cell argmax on the UNROUNDED cosine (the assignCells contract)
            val cell = -codebook.map { case (cid, c) =>
              (rawCos(emb, n, c, norm(c)), -cid)
            }.max._2
            kept.count { case (kid, kemb, knrm, kcell) =>
              kcell == cell && kid != id && cos(emb, n, kemb, knrm) >= 0.4
            }.toLong
          }
        assert(screened(id)._1 == expect,
          s"probe $id: screen says ${screened(id)._1} kept dups, brute force $expect")
        if (expect > 0) dupSeen = true
      }
      assert(dupSeen, "fixture must carry at least one screened duplicate")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("streaming semdedup screen: micro-batched probes equal the batch serving path") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup-stream").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-semdedup-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-semdedup-ckpt").toString
    try {
      Similarity.writeSemdedupIndex(spark, sf, dir)
      val probes = Tables.embeddings(spark, sf).select("vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getAs[Seq[Float]](1).toArray))
      assert(probes.length >= 3)
      val chunks = probes.grouped((probes.length + 2) / 3).toSeq
      val in = MemoryStream[(Long, Array[Float])]
      val (q, cached) = Streams.streamSemdedupScreen(
        in.toDF().toDF("vec_id", "embedding"), spark, dir, outDir, ckpt)
      try {
        chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
        def key(r: org.apache.spark.sql.Row) =
          (r.getLong(0), r.getLong(1), r.getBoolean(2))
        val streamed = spark.read.parquet(outDir)
          .select("vec_id", "n_dup_kept", "is_dup")
          .collect().map(key).toSet
        val batch = Similarity.semdedupScreenFromModel(spark, dir,
          Tables.embeddings(spark, sf).select("vec_id", "embedding"))
          .collect().map(key).toSet
        assert(streamed == batch,
          s"stream-only: ${(streamed -- batch).take(3)}; " +
            s"batch-only: ${(batch -- streamed).take(3)}")
      } finally { q.stop(); cached.unpersist(); () }
    } finally
      Seq(dir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
  }

  test("semdedup ingest grow: cross-batch and within-batch near-dups rejected, compaction folds admits") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup-grow").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-semdedup-gout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-semdedup-gck").toString
    try {
      Similarity.writeSemdedupIndex(spark, sf, dir)
      val kept = spark.read.parquet(s"$dir/kept").collect()
        .map(r => (r.getAs[Long]("vec_id"),
          r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      val keptCount = kept.length.toLong
      def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
      def cos(a: Array[Float], b: Array[Float]) =
        a.zip(b).map { case (x, y) => x.toDouble * y }.sum / (norm(a) * norm(b))
      // planted novel directions: deterministic search over seeded ±1
      // sign patterns, greedily keeping the first three that sit below
      // the 0.4 threshold against EVERY kept member AND each other, so
      // the "admitted" expectations below can never be vacuous
      val cands = (0 until 200).map(c => Array.tabulate(64)(i =>
        if (graft.functions.Portable.hash28Jvm(s"sem_${c}_$i") % 2 == 0) 1.0f
        else -1.0f))
      val picked = cands.foldLeft(Vector.empty[Array[Float]]) { (acc, v) =>
        if (acc.size < 3 &&
            kept.map(k => math.abs(cos(v, k._2))).max < 0.35 &&
            acc.forall(w => math.abs(cos(v, w)) < 0.35)) acc :+ v
        else acc
      }
      assert(picked.size == 3,
        s"fixture premise: only ${picked.size} well-separated planted directions")
      val Vector(x, y, z) = picked
      val xc = x.clone(); xc(0) = x(0) * 1.3f // ≈ x, over threshold
      val zc = z.clone(); zc(5) = z(5) * 1.4f // ≈ z
      val keptCopy = kept.head._2 // exact copy of a kept member
      val in = MemoryStream[(Long, Seq[Float])]
      val q = Streams.streamSemdedupIngest(
        in.toDF().toDF("vec_id", "embedding"), spark, dir, outDir, ckpt)
      try {
        in.addData(Seq((70001L, x.toSeq)))
        q.processAllAvailable()
        in.addData(Seq((70002L, xc.toSeq), (70003L, keptCopy.toSeq),
          (70004L, y.toSeq)))
        q.processAllAvailable()
        // within-batch pair: lowest id admitted, its near-dup rejected
        in.addData(Seq((70005L, z.toSeq), (70006L, zc.toSeq)))
        q.processAllAvailable()
        val got = spark.read.parquet(outDir).collect()
          .map(r => r.getAs[Long]("vec_id") ->
            ((r.getAs[Long]("n_dup_kept"), r.getAs[Boolean]("is_dup")))).toMap
        assert(!got(70001L)._2, s"batch-0 novel admitted: ${got(70001L)}")
        assert(got(70002L)._2,
          s"near-dup of a vector ADMITTED one batch earlier must reject: ${got(70002L)}")
        assert(got(70003L)._2, s"copy of a kept member: ${got(70003L)}")
        assert(!got(70004L)._2, s"novel in batch 1 admitted: ${got(70004L)}")
        assert(!got(70005L)._2 && got(70006L)._2,
          s"within-batch pair admits only the lowest id: ${got(70005L)}, ${got(70006L)}")
        // admitted tree holds exactly the three admitted vectors
        val admitted = spark.read.parquet(s"$dir/admitted")
          .select("vec_id").collect().map(_.getLong(0)).toSet
        assert(admitted == Set(70001L, 70004L, 70005L), s"admitted=$admitted")
        // redelivery-shaped rerun of batch 2 (own rows excluded, prior
        // batches visible) replays its verdicts exactly
        val again = Similarity.semdedupIngestVerdicts(
          Seq((70005L, z.toSeq), (70006L, zc.toSeq)).toDF("vec_id", "embedding"),
          Similarity.codebookFromDir(spark, dir), dir, excludeBatch = 2L)
          .collect().map(r => r.getAs[Long]("vec_id") ->
            ((r.getAs[Long]("n_dup_kept"), r.getAs[Boolean]("is_dup")))).toMap
        assert(again == got.filter(_._1 >= 70005L),
          "redelivered ingest must replay batch-2 verdicts identically")
        // compaction folds the admits into kept; a NEW near-dup of z is
        // now rejected by the FROZEN screen
        Similarity.compactSemdedupIndex(spark, dir)
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dir/admitted")))
        assert(models.ModelManifest.validate(spark, dir, "semdedup_index")
          .params.get("compactions").contains("1"))
        assert(spark.read.parquet(s"$dir/kept").count() == keptCount + 3)
        val zc2 = z.clone(); zc2(9) = 1.4f
        val frozen = Similarity.semdedupScreenFromModel(spark, dir,
          Seq((80001L, zc2.toSeq)).toDF("vec_id", "embedding")).collect().head
        assert(frozen.getAs[Boolean]("is_dup"),
          s"post-compaction frozen screen must see the admitted vector: $frozen")
        // idempotent when nothing new was admitted
        Similarity.compactSemdedupIndex(spark, dir)
        assert(models.ModelManifest.validate(spark, dir, "semdedup_index")
          .params.get("compactions").contains("1"))
      } finally q.stop()
    } finally
      Seq(dir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
  }
}
