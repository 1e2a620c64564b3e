package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module under `graft.operators` contributes a `queries` map (name →
  * `(SparkSession, sfDir) => DataFrame`) and an `oracles` map (name →
  * DuckDB-runnable ANSI SQL over the same parquet tables). Names present in
  * `queries` but absent from `oracleSql` are non-SQL-expressible operators
  * (sketch-based or stateful) checked by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Demo2-as-batch: per-(1-minute window, user) event counts (SURVEY.md §7.2 M0).
    */
  def entry(spark: SparkSession): DataFrame =
    BeamParity.demo2WindowCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    BeamParity.queries ++ Relational.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++ Skew.queries ++
      TemporalJoins.queries ++ TimeSeries.queries ++ Packing.queries ++
      DataQuality.queries ++ Scoring.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    BeamParity.oracles ++ Relational.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++ Skew.oracles ++
      TemporalJoins.oracles ++ TimeSeries.oracles ++ Packing.oracles ++
      DataQuality.oracles ++ Scoring.oracles
}
