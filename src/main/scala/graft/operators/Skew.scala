package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation (builder prompt: "skewed keys → salting or AQE
  * skew-join"). Two-phase salted aggregation: phase 1 aggregates on
  * (key, salt) so one hot key fans out over `salts` reducers; phase 2
  * merges the partials per key. The result is identical to a direct
  * `groupBy(key)` — verified by the DuckDB oracle — but no single reducer
  * ever sees more than ~1/salts of a hot key's rows.
  *
  * (For joins rather than aggregates, AQE's skew-join split —
  * `spark.sql.adaptive.skewJoin.enabled`, on by default — covers the same
  * risk without manual salting.)
  */
object Skew {

  /** Generic salted count/sum: `saltExpr` must be deterministic per row
    * (e.g. `pmod(col("event_id"), 16)`), value range [0, salts). */
  def saltedAgg(df: DataFrame, key: Column, saltExpr: Column,
      countAlias: String, sumCol: Column, sumAlias: String): DataFrame =
    df.groupBy(key.as("k"), saltExpr.as("_salt"))
      .agg(count(lit(1)).as("_pc"), sum(sumCol).as("_ps"))
      .groupBy(col("k"))
      .agg(sum("_pc").as(countAlias), sum("_ps").as(sumAlias))

  /** Per-user event counts via salted two-phase aggregation; same result as
    * a direct groupBy (the oracle is the direct form). */
  def skewSaltedCount(s: SparkSession, d: String): DataFrame =
    saltedAgg(Tables.events(s, d),
      col("user_id"), pmod(col("event_id"), lit(16)),
      "n_events", col("value"), "sum_value")
      .select(col("k").as("user_id"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
      .orderBy("user_id")

  val skewSaltedCountSql: String =
    """SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 2) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_count" -> (skewSaltedCount _))

  def oracles: Map[String, String] = Map(
    "skew_salted_count" -> skewSaltedCountSql)
}
