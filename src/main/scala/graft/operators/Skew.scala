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

  // ---------------------------------------------------------- diagnostic
  /** Key-skew diagnostic — the DETECTION pass the mitigations in this
    * file (and `asofSalted` / `asofSliced`) key off: per join/agg key,
    * the row count against the median key's, reporting every key above
    * 2× median with its skew ratio and the salt factor
    * (`ceil(n / median)`) a salted pre-pass would use for it. This is
    * the report a pipeline owner reads BEFORE turning on salting —
    * mitigation without measurement is guesswork at 100 TB.
    *
    * Scale shape: the per-key count is one partial+final aggregate; the
    * median is computed on the COUNTS frame (one row per key — orders of
    * magnitude smaller than the data) and joined back as a single-row
    * broadcast. At extreme key cardinality the exact percentile swaps
    * for `percentile_approx` with no plan change; exact is kept here as
    * the oracle-checkable form.
    */
  def skewDiagnostic(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.orders(s, d)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_rows"))
    val med = counts.agg(expr("percentile(n_rows, 0.5)").as("median_n"))
    counts.crossJoin(med) // med is one row: broadcast, not a real product
      .filter(col("n_rows") > col("median_n") * 2)
      .select(col("o_custkey"), col("n_rows"),
        round(col("median_n"), 1).as("median_n"),
        round(col("n_rows") / col("median_n"), 6).as("skew_ratio"),
        ceil(col("n_rows") / col("median_n")).cast("long").as("salt_factor"))
      .orderBy("o_custkey")
  }

  val skewDiagnosticSql: String =
    """WITH c AS (SELECT o_custkey, count(*) AS n_rows FROM orders GROUP BY 1),
      |m AS (SELECT median(n_rows) AS median_n FROM c)
      |SELECT o_custkey, CAST(n_rows AS BIGINT) AS n_rows,
      |  round(median_n, 1) AS median_n,
      |  round(n_rows / median_n, 6) AS skew_ratio,
      |  CAST(ceil(n_rows / median_n) AS BIGINT) AS salt_factor
      |FROM c CROSS JOIN m
      |WHERE n_rows > median_n * 2
      |ORDER BY o_custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_count" -> (skewSaltedCount _),
    "skew_diagnostic" -> (skewDiagnostic _))

  def oracles: Map[String, String] = Map(
    "skew_salted_count" -> skewSaltedCountSql,
    "skew_diagnostic" -> skewDiagnosticSql)
}
