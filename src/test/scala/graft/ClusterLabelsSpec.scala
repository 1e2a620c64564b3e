package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Persisted cluster labels (`Dedup.writeClusterLabels`) — the cluster
  * family's train-offline/serve-online split: pair generation + label
  * propagation (the slowest family in the bench) runs once, and the
  * three downstream consumers serve from the pair-density-sized label
  * parquet. Pinned here: (a) every `FromLabels` variant is row-identical
  * to its in-memory query; (b) the serving plans read the documents
  * table at most once (keep-best's quality projection) or once (split /
  * soft-weights doc_id projection) plus the label parquet — no shingle
  * explode, no pair join, no propagation in the plan.
  */
class ClusterLabelsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("serving the cluster family from persisted labels: identical rows, propagation-free plans") {
    val dir = java.nio.file.Files.createTempDirectory("graft-labels").toString
    try {
      Dedup.writeClusterLabels(spark, sf, dir)

      val variants = Seq[(String, org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame)](
        ("split_leakage_safe", Dedup.splitLeakageSafe(spark, sf),
          Dedup.splitLeakageSafeFromLabels(spark, sf, dir)),
        ("dedup_soft_weights", Dedup.dedupSoftWeights(spark, sf),
          Dedup.dedupSoftWeightsFromLabels(spark, sf, dir)),
        ("dedup_keep_best", Dedup.dedupKeepBest(spark, sf),
          Dedup.dedupKeepBestFromLabels(spark, sf, dir)))

      variants.foreach { case (name, inMem, served) =>
        val got = served.collect().map(_.toSeq).toSeq
        val expected = inMem.collect().map(_.toSeq).toSeq
        assert(got == expected, s"$name: served rows != in-memory rows")

        val paths = SparkTestSession.scanPaths(served)
        val docScans = paths.count(_.contains("documents.parquet"))
        assert(docScans == 1,
          s"$name: serving plan scans documents $docScans times " +
            s"(want 1 — no pair generation): $paths")
        assert(paths.exists(_.endsWith("/labels")),
          s"$name: serving plan misses the label parquet: $paths")
      }
    } finally SparkTestSession.deleteRecursively(dir)
  }
}
