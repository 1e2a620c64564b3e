package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted ANN index (`Similarity.writeAnnIndex` / `annFromIndex`) —
  * the serving-path completion of the `dedup_incremental_indexed`
  * pattern: training (k-means) and corpus encoding run ONCE at index
  * build; serving a probe batch reads only the index artifacts and the
  * probes. Pinned here: (a) served results are row-identical to the
  * in-memory `annIvfTrainedTopk` path (same deterministic training,
  * same serving join); (b) the serving plan scans the embeddings table
  * exactly once — for the probes — and everything else comes from the
  * index parquet (zero corpus re-reads, no k-means jobs).
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  /** Root paths of every parquet relation in the optimized plan. */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case _ => ""
        }
    }

  test("serving from the persisted index: identical results, probes-only embeddings scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-index").toString
    try {
      // maintenance half: train + encode once
      operators.Similarity.writeAnnIndex(spark, sf, dir)
      // serving half: the in-memory query's probe set, read fresh
      val probes = Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 100 === 0)
        .select("vec_id", "embedding")
      val served = operators.Similarity.annFromIndex(spark, probes, dir)

      // plan evidence: embeddings.parquet appears exactly once (the
      // probes); the corpus comes from the index dir
      val paths = scanPaths(served)
      val embScans = paths.filter(_.contains("embeddings.parquet"))
      assert(embScans.size == 1,
        s"serving plan scans embeddings ${embScans.size} times (want 1: probes only)")
      val idxScans = paths.filter(_.contains(dir))
      assert(idxScans.exists(_.endsWith("/corpus")),
        s"serving plan misses the index corpus: $paths")

      // result identity with the retrain-per-invocation path
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getAs[Long]("qid"), r.getAs[Int]("cell"), r.getAs[Int]("rank"),
          r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
      val got = rows(served)
      val expected = rows(operators.Similarity.annIvfTrainedTopk(spark, sf))
      assert(got.nonEmpty && got == expected,
        s"served (${got.size} rows) != in-memory (${expected.size} rows)")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("index corpus is partitioned by cell: a probe batch prunes to its cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-index-prune").toString
    try {
      operators.Similarity.writeAnnIndex(spark, sf, dir)
      val cells = spark.read.parquet(s"$dir/corpus")
        .select("cell").distinct().collect().map(_.getInt(0)).sorted
      assert(cells.length > 1, "fixture trains a single cell — pruning untestable")
      // one-cell read must touch only that partition's files
      val one = spark.read.parquet(s"$dir/corpus").filter(col("cell") === cells.head)
      val scan = one.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scan.nonEmpty)
      val selected = scan.head.selectedPartitions.partitionCount
      assert(selected == 1,
        s"cell filter selected $selected partitions (want 1 of ${cells.length})")
    } finally SparkTestSession.deleteRecursively(dir)
  }
}
