package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series operators over `events` — the offline complement to
  * the streaming windows (SURVEY.md §2.2 window rows): gap-based
  * sessionization via window functions and gap-filling resample via
  * `sequence` + anti-filling left join.
  *
  * Scale posture: both operators partition by `user_id`, so every window
  * sort and generated-range join is per-key and shuffles once on the key —
  * no global sort, no driver-side state. (Global sessionization — one
  * ordered pass over everything — is inherently serial and deliberately
  * not offered.)
  */
object TimeSeries {

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds 24 h. lag + cumulative-sum-of-flags; the
    * cumulative sum uses the default RANGE frame so rows with equal
    * timestamps (peers) always share a session id — that makes the result
    * invariant to the engine's ordering among ties.
    */
  def sessionizeGaps(s: SparkSession, d: String): DataFrame = {
    val gapS = 24 * 3600L
    val w = Window.partitionBy("user_id").orderBy("ts_s")
    Tables.events(s, d)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"))
      .withColumn("prev_ts", lag("ts_s", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts_s") - col("prev_ts") > gapS, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(w)) // default RANGE frame
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_s").as("start_s"), max("ts_s").as("end_s"))
      .orderBy("user_id", "sess_id")
  }

  val sessionizeGapsSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
      |flagged AS (
      |  SELECT user_id, ts_s,
      |    CASE WHEN lag(ts_s, 1) OVER (PARTITION BY user_id ORDER BY ts_s)
      |              IS NULL
      |           OR ts_s - lag(ts_s, 1) OVER
      |              (PARTITION BY user_id ORDER BY ts_s) > 86400
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM ev),
      |sessions AS (
      |  SELECT user_id, ts_s,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s) AS sess_id
      |  FROM flagged)
      |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  min(ts_s) AS start_s, max(ts_s) AS end_s
      |FROM sessions GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_id""".stripMargin

  /** Gap-filling resample: hourly event counts per user with missing hours
    * materialized as zero rows, spanning each user's own [min, max] hour.
    * `sequence` generates the per-user hour range (distributed, no driver
    * loop); a left join against the observed counts fills the gaps.
    */
  def gapFillResample(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") < 20)
      .select(col("user_id"),
        expr("(unix_timestamp(ts) div 3600) * 3600").as("hour_s"))
    val counts = ev.groupBy("user_id", "hour_s").agg(count(lit(1)).as("n_events"))
    val hours = ev.groupBy("user_id")
      .agg(min("hour_s").as("h0"), max("hour_s").as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, CAST(3600 AS BIGINT))")).as("hour_s"))
    hours.join(counts, Seq("user_id", "hour_s"), "left")
      .select(col("user_id"), col("hour_s"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("user_id", "hour_s")
  }

  val gapFillResampleSql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_s
      |  FROM events WHERE user_id < 20),
      |counts AS (
      |  SELECT user_id, hour_s, count(*) AS n_events FROM ev GROUP BY 1, 2),
      |spans AS (
      |  SELECT user_id, min(hour_s) AS h0, max(hour_s) AS h1
      |  FROM ev GROUP BY 1),
      |hours AS (
      |  SELECT user_id, unnest(range(h0, h1 + 3600, 3600)) AS hour_s
      |  FROM spans)
      |SELECT h.user_id, h.hour_s,
      |  CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
      |FROM hours h LEFT JOIN counts c
      |  ON h.user_id = c.user_id AND h.hour_s = c.hour_s
      |ORDER BY 1, 2""".stripMargin

  /** Ordered multi-step funnel (view → click → purchase): a user converts a
    * step only with an event STRICTLY AFTER their previous step's first
    * qualifying event — the product-analytics primitive for activation /
    * conversion reporting.
    *
    * Shape at scale: ONE shuffle by user_id, then three window passes over
    * the same partitioning (each step's first-qualifying timestamp is a
    * conditional min over the user's partition referencing the previous
    * step's column — `HashPartitioning(user_id)` satisfies all three, so
    * Catalyst inserts no further exchange), and a single global conditional
    * aggregate. No joins, no per-step re-scan; the DuckDB oracle expresses
    * the identical semantics as a step-wise join chain.
    */
  def eventFunnel(s: SparkSession, d: String): DataFrame = {
    val byU = Window.partitionBy("user_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(byU))
      .withColumn("t2", min(when(col("event_type") === "click" && col("ts") > col("t1"),
        col("ts"))).over(byU))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
        col("ts"))).over(byU))
      // t1/t2/t3 are constant per user and the stream is already
      // user_id-partitioned: reduce to one row per user FIRST (no new
      // exchange) so the global conditional counts aggregate n_users rows —
      // count_distinct over the raw stream would Expand every event row 3×
      .groupBy("user_id")
      .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
      .agg(
        count(when(col("t1").isNotNull, lit(1))).as("n_view"),
        count(when(col("t2").isNotNull, lit(1))).as("n_view_click"),
        count(when(col("t3").isNotNull, lit(1))).as("n_full_funnel"))
      .select(col("n_view"), col("n_view_click"), col("n_full_funnel"),
        expr("(n_full_funnel * 10000) div n_view").as("conv_bp"))
  }

  val eventFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
      |SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
      |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
      |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_full_funnel,
      |  CASE WHEN (SELECT count(*) FROM v) = 0 THEN NULL
      |       ELSE CAST(((SELECT count(*) FROM p) * 10000)
      |            // (SELECT count(*) FROM v) AS BIGINT)
      |  END AS conv_bp""".stripMargin

  /** Time-based rolling aggregates — the RANGE-frame complement to
    * `window_analytics`' ROWS frames: for every event, the count / sum /
    * max of the SAME user's events in the trailing 10 minutes, frame
    * bounds in event-time seconds (`rangeBetween(-600, 0)`), not row
    * counts. RANGE is the determinism-safe frame under timestamp ties
    * (peers always share the frame, so the result is invariant to the
    * engine's ordering among equal timestamps — same reasoning as
    * `sessionize_gaps`' cumulative sum).
    *
    * Scale posture: one `user_id` shuffle, per-key sort, single window
    * pass computing all three aggregates over one frame; no self-join
    * (the classic O(n·w) "event within 10 min of event" formulation) and
    * no global sort. At 100 TB hot users bound the per-task working set
    * by their own event count — the same skew profile every per-user
    * window query here carries, mitigated by AQE or the salting pattern
    * in `Skew` when a key dominates.
    */
  def rollingRangeAgg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-600, 0)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_s"), col("value"))
      .select(col("event_id"), col("user_id"), col("ts_s"),
        count(lit(1)).over(w).as("n_10m"),
        round(sum("value").over(w), 4).as("sum_10m"),
        round(max("value").over(w), 4).as("max_10m"))
      .orderBy("user_id", "ts_s", "event_id")
  }

  val rollingRangeAggSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |    value
      |  FROM events)
      |SELECT event_id, user_id, ts_s,
      |  CAST(count(*) OVER w AS BIGINT) AS n_10m,
      |  round(sum(value) OVER w, 4) AS sum_10m,
      |  round(max(value) OVER w, 4) AS max_10m
      |FROM ev
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
      |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts_s, event_id""".stripMargin

  // ---------------------------------------------------------- cohorts
  /** Weekly retention cohorts over the event stream — the classic
    * activity-analytics matrix: users grouped by first-seen week, then
    * for each (cohort, weeks-since) cell the distinct returning users
    * and the retention rate in integer basis points against the
    * cohort's week-0 size (every user is active in their own week 0 by
    * definition, so week 0 rows read 10000 bp by construction — the
    * built-in sanity row).
    *
    * All time arithmetic is integer epoch-day/`div` (no calendar-week
    * semantics cross the oracle boundary). Shape: one scan →
    * user-keyed first-seen aggregate joined back (AQE picks broadcast
    * when the user dimension allows) → two bounded aggregates; the
    * matrix is |cohorts| × |weeks| rows.
    */
  def retentionCohorts(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
    val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val cells = ev.join(first, "user_id")
      .select(col("user_id"),
        expr("cohort_day div 7").as("cohort_week"),
        expr("(day - cohort_day) div 7").as("weeks_since"))
      .groupBy("cohort_week", "weeks_since")
      .agg(countDistinct("user_id").as("n_users"))
    val sizes = cells.filter(col("weeks_since") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("weeks_since"), col("n_users"),
        col("cohort_size"),
        expr("n_users * 10000 div cohort_size").as("retention_bp"))
      .orderBy("cohort_week", "weeks_since")
  }

  val retentionCohortsSql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
      |cells AS (
      |  SELECT e.user_id,
      |    f.cohort_day // 7 AS cohort_week,
      |    (e.day - f.cohort_day) // 7 AS weeks_since
      |  FROM ev e JOIN first f USING (user_id)),
      |agg AS (
      |  SELECT cohort_week, weeks_since,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM cells GROUP BY 1, 2),
      |sizes AS (
      |  SELECT cohort_week, n_users AS cohort_size FROM agg
      |  WHERE weeks_since = 0)
      |SELECT a.cohort_week, a.weeks_since, a.n_users, s.cohort_size,
      |  CAST(a.n_users * 10000 // s.cohort_size AS BIGINT) AS retention_bp
      |FROM agg a JOIN sizes s USING (cohort_week)
      |ORDER BY cohort_week, weeks_since""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "retention_cohorts" -> (retentionCohorts _),
    "sessionize_gaps" -> (sessionizeGaps _),
    "gap_fill_resample" -> (gapFillResample _),
    "event_funnel" -> (eventFunnel _),
    "rolling_range_agg" -> (rollingRangeAgg _))

  def oracles: Map[String, String] = Map(
    "retention_cohorts" -> retentionCohortsSql,
    "sessionize_gaps" -> sessionizeGapsSql,
    "gap_fill_resample" -> gapFillResampleSql,
    "event_funnel" -> eventFunnelSql,
    "rolling_range_agg" -> rollingRangeAggSql)
}
