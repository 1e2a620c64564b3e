package graft.operators

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality / observability operators — the audit layer a production
  * ingest pipeline runs beside its transforms. The reference validates its
  * output by counting what landed in the warehouse (SURVEY.md §3 EP3: the
  * publisher emits a known workload, the demo verifies row counts
  * downstream, `utils/message_publisher.py:98-116`); these queries
  * generalize that "did the right data arrive?" check into the standard
  * audit battery a 100 TB training-data pipeline runs per ingest batch:
  * column profiles, referential integrity, constraint expectations,
  * mixture drift between batches, deterministic weighted sampling, and
  * volume-anomaly detection.
  *
  * Scale posture shared by all of them: every audit is a full-scan
  * ONE-PASS conditional aggregate (no per-constraint re-scan), the
  * per-group state is O(columns) or O(groups), and the only exchanges are
  * the final tiny aggregations — the same shape at sf0.01 and at 100 TB.
  */
object DataQuality {

  // ---------------------------------------------------------- column profile
  private val profiledCols = Seq("doc_id", "lang", "n_chars", "source", "text")

  /** Per-column profile of `documents` in ONE scan: row count, null count,
    * exact distinct count, min/max (rendered as a ≤40-char string so every
    * column type shares one output schema). The per-column distinct counts
    * expand the scan `n_cols`-fold inside a single Expand-based aggregate —
    * still one pass over parquet, no join. At 100 TB the exact
    * `count_distinct` is the knob to swap for `approx_count_distinct`
    * (same plan shape, sketch state instead of exact sets); the exact form
    * is kept here because the DuckDB oracle can only check exact values.
    */
  def profileColumns(s: SparkSession, d: String): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: profiledCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        substring(min(col(c)).cast("string"), 1, 40).as(s"${c}_min"),
        substring(max(col(c)).cast("string"), 1, 40).as(s"${c}_max"))
    }
    val stackArgs = profiledCols
      .map(c => s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max")
      .mkString(", ")
    Tables.documents(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${profiledCols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy("col_name")
  }

  val profileColumnsSql: String = {
    val perCol = profiledCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  substring(CAST(min($c) AS VARCHAR), 1, 40) AS min_val,
         |  substring(CAST(max($c) AS VARCHAR), 1, 40) AS max_val
         |FROM documents""".stripMargin
    }
    perCol.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ------------------------------------------------- referential integrity
  /** One FK relation's audit: total child rows and rows whose key has no
    * parent, computed in a single left join against the distinct'd parent
    * keys (count + orphan-count share the join; no separate anti-join
    * pass). Parent key sets are tiny relative to facts, so Catalyst
    * broadcasts them below the auto-broadcast threshold and falls back to
    * a shuffled join above it — the q18 posture, nothing forced.
    */
  private def fkRelation(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col(parentKey).isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(lit(name).as("relation"), col("n_child"), col("n_orphans"))

  /** Referential-integrity audit over the TPC-H-ish fact tables: every FK
    * edge a training join would traverse, one row per edge. Healthy
    * fixtures report zero orphans — the audit's value is the contract, not
    * the fixture's answer.
    */
  def fkIntegrity(s: SparkSession, d: String): DataFrame = {
    val edges = Seq(
      fkRelation("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey"),
      fkRelation("lineitem->part", Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey"),
      fkRelation("lineitem->supplier", Tables.lineitem(s, d), "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"),
      fkRelation("orders->customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"))
    edges.reduce(_.unionByName(_)).orderBy("relation")
  }

  val fkIntegritySql: String = {
    def edge(name: String, child: String, ck: String, parent: String,
        pk: String): String =
      s"""SELECT '$name' AS relation, CAST(count(*) AS BIGINT) AS n_child,
         |  CAST(sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
         |  ON c.$ck = p.$pk""".stripMargin
    Seq(
      edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }

  // ------------------------------------------------- constraint expectations
  /** Declarative expectation battery (the "unit tests for data" idiom):
    * each constraint is a boolean predicate; a row violates it when the
    * predicate is false OR NULL (a null can never *prove* the expectation,
    * so it counts against it — the dead-letter sink's null-safety rule,
    * `Streams.deadLetterBatch`). All constraints on a table evaluate in
    * one conditional-aggregate pass over that table's scan; the output is
    * one row per constraint.
    */
  def constraintAudit(s: SparkSession, d: String): DataFrame = {
    def violations(pred: Column): Column =
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))

    val docs = Tables.documents(s, d).agg(
      count(lit(1)).as("n_checked"),
      violations(col("doc_id").isNotNull).as("v1"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("v2"),
      violations(col("n_chars") === length(col("text"))).as("v3"),
      violations(col("lang").isin("de", "en", "es", "fr", "zh")).as("v4"),
      violations(col("n_chars").between(1L, 10000000L)).as("v5"))
      .selectExpr("n_checked",
        "stack(5, 'documents.doc_id_not_null', v1, " +
          "'documents.doc_id_unique', v2, " +
          "'documents.n_chars_matches_text', v3, " +
          "'documents.lang_accepted', v4, " +
          "'documents.n_chars_in_range', v5) AS (check_name, n_violations)")

    val orders = Tables.orders(s, d).agg(
      count(lit(1)).as("n_checked"),
      violations(col("o_custkey").isNotNull).as("v1"),
      violations(col("o_totalprice") > 0.0).as("v2"),
      violations(col("o_orderdate") >= to_timestamp(lit("1990-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("2031-01-01"))).as("v3"))
      .selectExpr("n_checked",
        "stack(3, 'orders.custkey_not_null', v1, " +
          "'orders.totalprice_positive', v2, " +
          "'orders.orderdate_in_range', v3) AS (check_name, n_violations)")

    docs.unionByName(orders)
      .select(col("check_name"), col("n_checked"), col("n_violations"))
      .orderBy("check_name")
  }

  val constraintAuditSql: String =
    """WITH doc_agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_checked,
      |    CAST(sum(CASE WHEN COALESCE(doc_id IS NOT NULL, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v1,
      |    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS v2,
      |    CAST(sum(CASE WHEN COALESCE(n_chars = length(text), FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v3,
      |    CAST(sum(CASE WHEN COALESCE(lang IN ('de','en','es','fr','zh'), FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v4,
      |    CAST(sum(CASE WHEN COALESCE(n_chars BETWEEN 1 AND 10000000, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v5
      |  FROM documents),
      |ord_agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_checked,
      |    CAST(sum(CASE WHEN COALESCE(o_custkey IS NOT NULL, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v1,
      |    CAST(sum(CASE WHEN COALESCE(o_totalprice > 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v2,
      |    CAST(sum(CASE WHEN COALESCE(o_orderdate >= TIMESTAMP '1990-01-01'
      |      AND o_orderdate < TIMESTAMP '2031-01-01', FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v3
      |  FROM orders)
      |SELECT check_name, n_checked, n_violations FROM (
      |  SELECT 'documents.doc_id_not_null' AS check_name, n_checked, v1 AS n_violations FROM doc_agg
      |  UNION ALL SELECT 'documents.doc_id_unique', n_checked, v2 FROM doc_agg
      |  UNION ALL SELECT 'documents.n_chars_matches_text', n_checked, v3 FROM doc_agg
      |  UNION ALL SELECT 'documents.lang_accepted', n_checked, v4 FROM doc_agg
      |  UNION ALL SELECT 'documents.n_chars_in_range', n_checked, v5 FROM doc_agg
      |  UNION ALL SELECT 'orders.custkey_not_null', n_checked, v1 FROM ord_agg
      |  UNION ALL SELECT 'orders.totalprice_positive', n_checked, v2 FROM ord_agg
      |  UNION ALL SELECT 'orders.orderdate_in_range', n_checked, v3 FROM ord_agg)
      |ORDER BY check_name""".stripMargin

  // ----------------------------------------------------------- mixture drift
  /** Source-mixture drift between two deterministic halves of the corpus
    * (hash-parity split — in production the two sides are "yesterday's
    * batch" vs "today's"): per source, both counts, both mixture
    * proportions, the source's term of KL(A‖B), and its total-variation
    * contribution |p_a−p_b|/2. Flag thresholds live downstream; the audit
    * reports the decomposition so a drifted source is directly nameable.
    *
    * Conventions at the edges: a source absent from A contributes 0 to KL
    * by the 0·log 0 convention; present in A but absent from B makes
    * KL(A‖B) infinite — reported as NULL rather than a sentinel. The
    * per-source totals come from an unpartitioned window over the
    * aggregated source rows — O(distinct sources) rows, not corpus rows,
    * so the single-partition window is a few KB at any corpus size.
    */
  def mixtureDrift(s: SparkSession, d: String): DataFrame = {
    val half = Portable.hash28(col("doc_id").cast("string")) % 2
    val w = Window.partitionBy(lit(1))
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(
        sum(when(half === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(half === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("p_a", col("n_a").cast("double") / sum("n_a").over(w))
      .withColumn("p_b", col("n_b").cast("double") / sum("n_b").over(w))
      .select(
        col("source"), col("n_a"), col("n_b"),
        round(col("p_a"), 6).as("p_a"),
        round(col("p_b"), 6).as("p_b"),
        when(col("n_a") === 0L, 0.0)
          .when(col("n_b") === 0L, lit(null).cast("double"))
          .otherwise(round(col("p_a") * log(col("p_a") / col("p_b")), 6))
          .as("kl_term"),
        round(abs(col("p_a") - col("p_b")) / 2.0, 6).as("tv_term"))
      .orderBy("source")
  }

  val mixtureDriftSql: String =
    s"""WITH halves AS (
       |  SELECT source,
       |    CAST(sum(CASE WHEN ${Portable.hash28Sql("doc_id::VARCHAR")} % 2 = 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN ${Portable.hash28Sql("doc_id::VARCHAR")} % 2 = 1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM documents GROUP BY source),
       |props AS (
       |  SELECT source, n_a, n_b,
       |    n_a / CAST(sum(n_a) OVER () AS DOUBLE) AS p_a,
       |    n_b / CAST(sum(n_b) OVER () AS DOUBLE) AS p_b
       |  FROM halves)
       |SELECT source, n_a, n_b,
       |  round(p_a, 6) AS p_a, round(p_b, 6) AS p_b,
       |  CASE WHEN n_a = 0 THEN 0.0
       |       WHEN n_b = 0 THEN NULL
       |       ELSE round(p_a * ln(p_a / p_b), 6) END AS kl_term,
       |  round(abs(p_a - p_b) / 2.0, 6) AS tv_term
       |FROM props ORDER BY source""".stripMargin

  // ---------------------------------------------------- weighted sampling
  /** Deterministic weighted (curriculum) sampling: each document's keep
    * probability is a quality weight — here `min(1, n_chars/400)`, longer
    * documents preferred — and membership is decided row-locally by
    * comparing the weight against a uniform draw derived from the
    * document's portable id-hash. No RNG state, no shuffle on the data
    * path: the same corpus always yields the same sample (the
    * reproducibility property a training pipeline needs for restarts and
    * audits), and re-weighting is a constant-folding change, not a new
    * sampling infrastructure. The audit aggregate per language compares
    * the realized keep-rate against the mean weight.
    */
  def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    val weight = least(lit(1.0), col("n_chars").cast("double") / 400.0)
    val draw = (Portable.hash28(concat(lit("wsample:"),
      col("doc_id").cast("string"))) % 1000000L).cast("double") / 1000000.0
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), weight.as("w"), (draw < weight).as("kept"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        round(avg(col("w")), 6).as("avg_weight"),
        round(sum(when(col("kept"), 1.0).otherwise(0.0)) / count(lit(1)), 6)
          .as("kept_rate"),
        min(when(col("kept"), col("doc_id"))).as("first_kept_id"))
      .orderBy("lang")
  }

  val sampleWeightedSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    least(1.0, n_chars / 400.0) AS w,
       |    (${Portable.hash28Sql("'wsample:' || doc_id::VARCHAR")} % 1000000)
       |      / 1000000.0 < least(1.0, n_chars / 400.0) AS kept
       |  FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  round(avg(w), 6) AS avg_weight,
       |  round(sum(CASE WHEN kept THEN 1.0 ELSE 0.0 END) / count(*), 6) AS kept_rate,
       |  min(CASE WHEN kept THEN doc_id END) AS first_kept_id
       |FROM scored GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------- volume anomalies
  /** Daily ingest-volume anomaly detection: events per day, each day's
    * z-score against the mean/stddev over all days, the monitoring query
    * behind "did yesterday's ingest silently halve?". The heavy aggregate
    * is the per-day count (map-side combinable); the statistics then run
    * in an unpartitioned window over O(days) rows — tiny forever, so the
    * single-partition window is deliberate, not an oversight. A stddev of
    * zero (perfectly constant volume) yields NULL z-scores in both
    * engines.
    */
  def anomalyDays(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(lit(1))
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_timestamp(col("day")).as("day_s"),
        col("n_events"),
        round((col("n_events") - avg(col("n_events")).over(w)) /
          stddev_samp(col("n_events")).over(w), 4).as("z"))
      .orderBy("day_s")
  }

  val anomalyDaysSql: String =
    """WITH by_day AS (
      |  SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1)
      |SELECT day_s, n_events,
      |  round((n_events - avg(n_events) OVER ()) / stddev_samp(n_events) OVER (), 4) AS z
      |FROM by_day ORDER BY day_s""".stripMargin

  // ---------------------------------------------------------- corpus diff
  /** Snapshot-to-snapshot corpus reconciliation — the audit a pipeline
    * runs after every re-ingest of a living corpus: which documents were
    * ADDED, REMOVED, CHANGED (same id, different content), or carried
    * UNCHANGED, broken down by source. The "previous" snapshot is derived
    * deterministically from the fixture (docs with id % 13 = 0 absent →
    * added now; id % 17 = 0 carried a mutated text → changed; a retired
    * cohort at id % 19 = 0 present only in prev under offset ids →
    * removed), so both engines build identical snapshots and the diff
    * logic itself is what the oracle checks.
    *
    * Scale posture: content equality travels as an md5 FINGERPRINT
    * projected on each side BEFORE the join, so the only wide exchange
    * shuffles (id, source, 32-byte fp) rows, never document text; the
    * diff is ONE full-outer join keyed by doc_id (snapshots bucketed or
    * partitioned by doc_id at 100 TB make it co-located, zero-shuffle)
    * and the output is O(statuses × sources). This is the batch
    * complement of [[graft.operators.Relational]]'s CDC apply: CDC
    * replays a change LOG; the diff recovers the log when none was kept.
    */
  /** The fixture-derived snapshots as fingerprint-only (doc_id, source,
    * fp) frames — the seams the streaming twin shares with the batch
    * query, so ingest-time and batch-time classification can never
    * diverge. */
  // Fingerprints are over coalesce(text, '') — md5(NULL) is NULL, and a
  // null fp would misclassify (a doc present in both snapshots with null
  // text would read 'added'; a mutated doc with null text would read
  // 'unchanged' through the null <> comparison). Coalescing makes every
  // fp non-null, so the status CASE is total. Mirrored in the oracle SQL.
  private[graft] def currSnapshot(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      md5(coalesce(col("text"), lit(""))).as("fp"))

  private[graft] def prevSnapshot(docs: DataFrame): DataFrame =
    // retired-cohort ids are NEGATED (-doc_id - 1): real document ids are
    // non-negative in every fixture and every SfGen upsample, so the
    // retired band is PROVABLY disjoint at any scale — unlike the earlier
    // fixed +7777777 offset, which relied on doc_id ranges staying below
    // the offset (a >2.2M-contiguous-id corpus would have collided retired
    // ids with real docs, duplicating join keys in prev and silently
    // breaking the 'removed' semantics)
    docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), col("source"),
        md5(when(col("doc_id") % 17 === 0,
          concat(coalesce(col("text"), lit("")), lit(" OLD")))
          .otherwise(coalesce(col("text"), lit("")))).as("fp"))
      .unionByName(docs.filter(col("doc_id") % 19 === 0)
        .select((-col("doc_id") - lit(1L)).as("doc_id"), col("source"),
          md5(coalesce(col("text"), lit(""))).as("fp")))

  /** One micro-batch's diff verdict: classify ARRIVING current-snapshot
    * rows against the previous snapshot — added/changed/unchanged per
    * source. `removed` is deliberately absent: a micro-batch witnesses
    * presence, never absence, so removal is the end-of-snapshot
    * reconciliation only the batch [[corpusDiff]] can emit. Per-doc
    * classification is batching-invariant, so per-batch counts summed
    * over any replay equal the batch query's non-removed rows exactly
    * (pinned in StreamingSpec). */
  private[graft] def diffVerdictBatch(batch: DataFrame,
      prev: DataFrame): DataFrame =
    currSnapshot(batch)
      .join(prev.select(col("doc_id"), col("fp").as("p_fp")),
        Seq("doc_id"), "left")
      .select(
        when(col("p_fp").isNull, lit("added"))
          .when(col("p_fp") =!= col("fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("source"))
      .groupBy("status", "source").agg(count(lit(1)).as("n_docs"))

  def corpusDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val curr = currSnapshot(docs)
    val prev = prevSnapshot(docs)
    prev.select(col("doc_id"), col("source").as("p_source"), col("fp").as("p_fp"))
      .join(curr.select(col("doc_id"), col("source").as("c_source"),
        col("fp").as("c_fp")), Seq("doc_id"), "full_outer")
      .select(
        when(col("p_fp").isNull, lit("added"))
          .when(col("c_fp").isNull, lit("removed"))
          .when(col("p_fp") =!= col("c_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        coalesce(col("c_source"), col("p_source")).as("source"))
      .groupBy("status", "source").agg(count(lit(1)).as("n_docs"))
      .orderBy("status", "source")
  }

  val corpusDiffSql: String =
    """WITH curr AS (
      |  SELECT doc_id, source, md5(coalesce(text, '')) AS fp FROM documents),
      |prev AS (
      |  SELECT doc_id, source,
      |    md5(CASE WHEN doc_id % 17 = 0 THEN coalesce(text, '') || ' OLD'
      |             ELSE coalesce(text, '') END) AS fp
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT -doc_id - 1 AS doc_id, source, md5(coalesce(text, '')) AS fp
      |  FROM documents WHERE doc_id % 19 = 0)
      |SELECT CASE WHEN p.fp IS NULL THEN 'added'
      |            WHEN c.fp IS NULL THEN 'removed'
      |            WHEN p.fp <> c.fp THEN 'changed'
      |            ELSE 'unchanged' END AS status,
      |  coalesce(c.source, p.source) AS source,
      |  CAST(count(*) AS BIGINT) AS n_docs
      |FROM prev p FULL OUTER JOIN curr c USING (doc_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_columns" -> (profileColumns _),
    "fk_integrity" -> (fkIntegrity _),
    "constraint_audit" -> (constraintAudit _),
    "mixture_drift" -> (mixtureDrift _),
    "sample_weighted" -> (sampleWeighted _),
    "anomaly_days" -> (anomalyDays _),
    "corpus_diff" -> (corpusDiff _))

  def oracles: Map[String, String] = Map(
    "profile_columns" -> profileColumnsSql,
    "fk_integrity" -> fkIntegritySql,
    "constraint_audit" -> constraintAuditSql,
    "mixture_drift" -> mixtureDriftSql,
    "sample_weighted" -> sampleWeightedSql,
    "anomaly_days" -> anomalyDaysSql,
    "corpus_diff" -> corpusDiffSql)
}
