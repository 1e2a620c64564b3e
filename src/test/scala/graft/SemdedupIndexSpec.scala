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
}
