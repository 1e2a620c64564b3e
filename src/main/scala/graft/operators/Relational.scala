package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator breadth (SURVEY.md §2.2 — every "Implement? yes"
  * row): projections, filters, equi/semi/anti joins, hash aggregation,
  * distinct + approx-distinct, rollup/cube, SQL window functions,
  * sort/limit/top-k, set ops, and the scalar function families
  * (string/date/math/JSON/conditional).
  *
  * Scale posture (the part that matters at 100 TB):
  *  - every query is a declarative plan — filters and projections reach the
  *    parquet scan (`PushedFilters`/`ReadSchema` in `.explain`);
  *  - dimension tables (region/nation/supplier/customer) are joined with an
  *    explicit `broadcast()` hint so the fact table never shuffles for them;
  *  - aggregates are partial+final HashAggregate (map-side combine) planned
  *    by Catalyst automatically;
  *  - top-k uses `orderBy().limit(k)` which Spark plans as
  *    `TakeOrderedAndProject` (per-partition heap, no full sort/shuffle).
  *
  * Double-valued aggregates are rounded (2–6 dp) in both the Spark plan and
  * the DuckDB oracle so cross-engine float summation order cannot flip the
  * hash comparison.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1-shaped pricing summary: filter → wide hash aggregate. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(revenue), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q3
  /** TPC-H Q3-shaped: 3-way join, aggregate, top-10 by revenue.
    * Ranking happens on the *rounded* revenue so float summation order can
    * never reorder the top-k across engines; ties break on o_orderkey.
    */
  def q3TopOrders(s: SparkSession, d: String): DataFrame =
    cust(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(ord(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(revenue), 2).as("revenue"))
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  val q3Sql: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |  AND l_shipdate > TIMESTAMP '1999-01-01'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q5
  /** TPC-H Q5-shaped: 6-way star join. Only the genuinely bounded dimensions
    * (nation: 25 rows, region: 5 — fixed by the schema, independent of scale
    * factor) carry explicit broadcast hints. customer/supplier GROW with the
    * corpus: an unconditional hint would override Catalyst's size check and
    * die at the 8 GB broadcast limit on a large cluster, so they are left to
    * the autoBroadcastJoinThreshold + AQE, which picks BHJ while they fit
    * (they do at bench scale) and degrades to shuffled SMJ/SHJ — instead of
    * an OOM — when they don't.
    */
  def q5NationRevenue(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(revenue), 2).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")

  val q5Sql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q18
  /** TPC-H Q18-shaped (large-volume orders): a HAVING-filtered aggregate
    * subquery (orders whose total quantity exceeds 300) drives the main
    * join — the "derive a qualifying key set by aggregation, then enrich
    * it" shape missing from the other TPC-H queries. Scale posture: the
    * HAVING subquery is a partial+final HashAggregate over lineitem whose
    * survivors are rare (p99 of order quantity is ~265) — but "rare
    * fraction" still GROWS with the corpus, so there is deliberately NO
    * explicit broadcast hint (the q5 lesson): this is AQE's sweet spot —
    * the filtered aggregate's true size is known at runtime, and AQE
    * re-plans the join to broadcast while it fits and a shuffled join when
    * it doesn't. The quantity sum is rounded BEFORE the threshold
    * comparison (and before re-aggregation) so both engines agree at the
    * boundary.
    */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val heavy = li(s, d)
      .groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    ord(s, d)
      .join(heavy, col("o_orderkey") === col("l_orderkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  val q18Sql: String =
    """WITH heavy AS (
      |  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING round(sum(l_quantity), 2) > 300)
      |SELECT c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  round(o_totalprice, 2) AS o_totalprice, sum_qty
      |FROM orders
      |JOIN heavy ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q6
  /** TPC-H Q6-shaped: pure filter + global aggregate — the predicate set is
    * fully pushed into the parquet scan.
    */
  def q6FilterAgg(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  val q6Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- joins
  /** Left-semi join (EXISTS): orders having at least one heavy line item. */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .join(li(s, d).filter(col("l_quantity") > 45)
        .select(col("l_orderkey")), col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_orderstatus")

  val joinSemiSql: String =
    """SELECT o_orderstatus,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  round(sum(o_totalprice), 2) AS sum_price
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no order since 2001. */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .join(ord(s, d)
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), round(avg("c_acctbal"), 2).as("avg_bal"))
      .orderBy("c_mktsegment")

  val joinAntiSql: String =
    """SELECT c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  round(avg(c_acctbal), 2) AS avg_bal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2001-01-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- top-k
  /** Global top-k — planned as TakeOrderedAndProject (no total sort). */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  val topkOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin

  // ---------------------------------------------------------------- distinct
  def distinctAgg(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .groupBy("c_mktsegment")
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  val distinctAggSql: String =
    """SELECT c_mktsegment,
      |  CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
      |  CAST(count(*) AS BIGINT) AS n_customers
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** HLL++ approximate distinct, oracle-closed by the exact-twin +
    * verdict-literal pattern (`hll_union_sources`): the emitted row
    * carries the EXACT distinct count (DuckDB reproduces it verbatim) and
    * a boolean verdict that the sketch estimate sits within 2.5× its
    * configured rsd (0.02 ⇒ bound 5%) of that exact. The oracle asserts
    * `approx_in_bound = TRUE` as a literal, so a sketch drifting out of
    * its published bound turns the driver's hash compare red — a real
    * oracle check, not rows-only. The raw estimate itself stays out of
    * the compared frame (HLL++ register contents are engine-specific);
    * the verdict computes on the unrounded estimate before projection.
    * At 100 TB only the one-pass fixed-memory sketch path survives; the
    * exact twin is this query's fixture-scale acceptance harness.
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.05).as("approx_in_bound"))
      .orderBy("l_returnflag")

  val approxDistinctSql: String =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  TRUE AS approx_in_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Mergeable distinct-count SET OPERATIONS via Apache DataSketches HLL
    * (Spark 3.5+ `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`)
    * — the sketch the `approx_count_distinct` HLL++ CANNOT provide: its
    * per-group state is not user-mergeable, while DataSketches sketches are
    * first-class values that union across groups/days/partitions. Here:
    * per-source distinct-document sketches over the `documents` table,
    * merged into a corpus-wide union estimate — the cross-source overlap
    * estimator (sum of per-source estimates minus union estimate ≈
    * cross-source duplicate mass) a 100 TB curation pipeline keeps as a
    * tiny persisted artifact instead of re-counting the corpus.
    *
    * Oracle-checkable EXACT-REGIME form: raw sketch estimates are
    * engine-specific, so the emitted row carries (a) the exact distinct
    * counts (per-source sum, corpus union, their difference = true
    * cross-source duplicate mass) that DuckDB reproduces verbatim, and
    * (b) IN-BOUND VERDICTS — every per-source estimate and the merged
    * union estimate within 3 RSE (lgK=12 ⇒ RSE ≈ 1.6%, bound 5%) of its
    * exact twin. The oracle asserts the verdict columns as literals
    * (`n_sources_in_bound = n_sources`, `union_in_bound = TRUE`), so a
    * sketch drifting out of its published bound turns the driver's
    * hash compare red — a real oracle check, not rows-only. The exact
    * twin costs one extra distinct aggregation at fixture scale; at
    * 100 TB a pipeline keeps only the sketch path (the mergeable
    * artifact) and this query is its acceptance harness.
    */
  def hllUnionSources(s: SparkSession, d: String): DataFrame = {
    val fp = Tables.documents(s, d)
      .select(col("source"), graft.functions.Portable.docFingerprint.as("fp"))
    val per = fp.groupBy("source")
      .agg(
        hll_sketch_agg(col("fp"), lit(12)).as("sk"),
        countDistinct(col("fp")).as("exact_docs"))
      .select(col("source"), col("sk"), col("exact_docs"),
        hll_sketch_estimate(col("sk")).cast("double").as("est_docs"))
    val merged = per.agg(
      count(lit(1)).as("n_sources"),
      sum("exact_docs").as("exact_sum_sources"),
      sum(when(abs(col("est_docs") - col("exact_docs")) <=
        col("exact_docs") * 0.05, 1L).otherwise(0L)).as("n_sources_in_bound"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).cast("double").as("union_est"))
    val exactUnion = fp.agg(countDistinct(col("fp")).as("exact_union"))
    merged.crossJoin(exactUnion)
      .select(
        col("n_sources"), col("exact_sum_sources"), col("exact_union"),
        (col("exact_sum_sources") - col("exact_union")).as("exact_cross_source_dups"),
        col("n_sources_in_bound"),
        (abs(col("union_est") - col("exact_union")) <=
          col("exact_union") * 0.05).as("union_in_bound"))
  }

  val hllUnionSourcesSql: String =
    s"""WITH fp AS (
       |  SELECT source, ${graft.functions.Portable.docFingerprintSql} AS fp
       |  FROM documents),
       |per AS (
       |  SELECT source, count(DISTINCT fp) AS exact_docs FROM fp GROUP BY source)
       |SELECT CAST(count(*) AS BIGINT) AS n_sources,
       |  CAST(sum(exact_docs) AS BIGINT) AS exact_sum_sources,
       |  CAST((SELECT count(DISTINCT fp) FROM fp) AS BIGINT) AS exact_union,
       |  CAST(sum(exact_docs) - (SELECT count(DISTINCT fp) FROM fp) AS BIGINT)
       |    AS exact_cross_source_dups,
       |  CAST(count(*) AS BIGINT) AS n_sources_in_bound,
       |  TRUE AS union_in_bound
       |FROM per""".stripMargin

  // -------------------------------------------------------------- count-min
  /** Count-min point-frequency estimates for every user in the events
    * table, next to the exact counts — the mergeable frequency sketch
    * ([[graft.functions.CountMinAggregator]]) completing the sketch family
    * (HLL: distinct; Misra–Gries: which items are heavy; CMS: how heavy is
    * THIS item). 150 users into width-64 rows forces real collisions, so
    * `overcount` is non-zero for some rows and the grid genuinely exercises
    * the min-over-rows estimate.
    *
    * Because buckets come from the portable md5 hash, the DuckDB oracle
    * rebuilds the IDENTICAL grid with a group-by and compares estimates
    * value-for-value — full hash equality on a sketch, not a verdict
    * literal (the `hll_union_sources` pattern upgraded). The probabilistic
    * contract (overcount-only, `≤ e/width · N` with prob `1 − e^−depth`)
    * rides in `in_bound`, identically computed both sides; merge exactness
    * and overcount-only are `CmsProps` properties. The parallelize forces a
    * multi-partition plan so partial grids genuinely merge.
    */
  def cmsUserCounts(s: SparkSession, d: String): DataFrame = {
    val depth = 3; val width = 64
    val cms = udaf(new graft.functions.CountMinAggregator(depth, width),
      org.apache.spark.sql.Encoders.STRING)
    val ev = Tables.parallelize(s,
      Tables.events(s, d).select(col("user_id").cast("string").as("item")))
    val sk = ev.agg(cms(col("item")).as("sk"))
    val users = ev.groupBy("item").agg(count(lit(1)).as("exact_count"))
    val ests = (0 until depth).map { dd =>
      element_at(col("sk.table"),
        (lit(dd * width) +
          (graft.functions.Portable.hash28(concat(lit(s"$dd:"), col("item"))) % width) +
          lit(1)).cast("int"))
    }
    users.crossJoin(sk) // sk is one row: broadcast, not a real product
      .select(col("item").cast("long").as("user_id"), col("exact_count"),
        ests.reduce(least(_, _)).as("est_count"),
        col("sk.total").as("sketch_total"))
      .select(col("user_id"), col("exact_count"), col("est_count"),
        (col("est_count") - col("exact_count")).as("overcount"),
        (col("est_count") - col("exact_count") <=
          floor(col("sketch_total") * lit(2.71828) / lit(width))).as("in_bound"))
      .orderBy("user_id")
  }

  val cmsUserCountsSql: String = {
    def h(e: String) = graft.functions.Portable.hash28Sql(e)
    s"""WITH ev AS (SELECT user_id::VARCHAR AS item FROM events),
       |ds(d) AS (SELECT * FROM (VALUES (0), (1), (2))),
       |cells AS (
       |  SELECT d, ${h("d::VARCHAR || ':' || item")} % 64 AS b, count(*) AS c
       |  FROM ev CROSS JOIN ds GROUP BY 1, 2),
       |users AS (SELECT item, count(*) AS exact_count FROM ev GROUP BY 1),
       |probes AS (
       |  SELECT u.item, u.exact_count, min(c.c) AS est_count
       |  FROM users u
       |  CROSS JOIN ds
       |  JOIN cells c
       |    ON c.d = ds.d
       |   AND c.b = ${h("ds.d::VARCHAR || ':' || u.item")} % 64
       |  GROUP BY 1, 2)
       |SELECT CAST(item AS BIGINT) AS user_id,
       |  CAST(exact_count AS BIGINT) AS exact_count,
       |  CAST(est_count AS BIGINT) AS est_count,
       |  CAST(est_count - exact_count AS BIGINT) AS overcount,
       |  (est_count - exact_count) <=
       |    floor((SELECT count(*) FROM ev) * 2.71828 / 64) AS in_bound
       |FROM probes ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- set ops
  /** UNION / EXCEPT / INTERSECT (distinct semantics) over the nation sets of
    * two market segments, reduced to one deterministic row of counts.
    */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val a = cust(s, d).filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
    val b = cust(s, d).filter(col("c_mktsegment") === "MACHINERY").select("c_nationkey")
    // one lazy plan (no driver-side actions): three tiny aggregates cross-joined
    a.union(b).distinct().agg(count(lit(1)).as("n_union"))
      .crossJoin(a.distinct().except(b.distinct()).agg(count(lit(1)).as("n_except")))
      .crossJoin(a.distinct().intersect(b.distinct()).agg(count(lit(1)).as("n_intersect")))
  }

  val setOpsSql: String =
    """SELECT
      |  CAST((SELECT count(*) FROM (SELECT c_nationkey FROM customer WHERE c_mktsegment='BUILDING'
      |        UNION SELECT c_nationkey FROM customer WHERE c_mktsegment='MACHINERY')) AS BIGINT) AS n_union,
      |  CAST((SELECT count(*) FROM (SELECT c_nationkey FROM customer WHERE c_mktsegment='BUILDING'
      |        EXCEPT SELECT c_nationkey FROM customer WHERE c_mktsegment='MACHINERY')) AS BIGINT) AS n_except,
      |  CAST((SELECT count(*) FROM (SELECT c_nationkey FROM customer WHERE c_mktsegment='BUILDING'
      |        INTERSECT SELECT c_nationkey FROM customer WHERE c_mktsegment='MACHINERY')) AS BIGINT) AS n_intersect""".stripMargin

  // ---------------------------------------------------------------- window fns
  /** SQL window functions: ranking + lag + running sum inside each order. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    li(s, d)
      .filter(col("l_orderkey") < 200)
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      .withColumn("running_qty",
        round(sum(col("l_quantity")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .filter(col("rn") <= 2)
      .select("l_orderkey", "l_linenumber", "rn", "prev_qty", "running_qty")
      .orderBy("l_orderkey", "rn")
  }

  val windowRankSql: String =
    """SELECT l_orderkey, l_linenumber, rn, prev_qty, running_qty FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(row_number() OVER w AS INTEGER) AS rn,
      |    lag(l_quantity, 1) OVER w AS prev_qty,
      |    round(sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      |  FROM lineitem WHERE l_orderkey < 200
      |  WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber))
      |WHERE rn <= 2
      |ORDER BY l_orderkey, rn""".stripMargin

  // ---------------------------------------------------------------- rollup/cube
  def rollupSales(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")

  val rollupSalesSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  def cubeSales(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n"), col("sum_price"))
      .orderBy("orderstatus", "orderpriority")

  val cubeSalesSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
      |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(o_totalprice), 2) AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY orderstatus, orderpriority""".stripMargin

  /** GROUPING SETS through the SQL entry point (`spark.sql` over a temp
    * view) — same Catalyst Expand-based plan as rollup/cube, exercising the
    * engine's SQL surface alongside the DataFrame API.
    */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    li(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- scalar fns
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("int").as("brand_num"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        instr(col("p_name"), "e").cast("long").as("e_pos"),
        lpad(col("p_type"), 10, "_").as("type_padded"))
      .orderBy("p_partkey")

  val stringFuncsSql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS brand_num,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  CAST(strpos(p_name, 'e') AS BIGINT) AS e_pos,
      |  lpad(p_type, 10, '_') AS type_padded
      |FROM part ORDER BY p_partkey""".stripMargin

  def dateFuncs(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .groupBy(
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"),
        round(avg(datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))), 2)
          .as("avg_age_days"))
      .orderBy("o_year", "o_quarter")

  val dateFuncsSql: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  round(sum(o_totalprice), 2) AS sum_price,
      |  round(avg(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01')), 2) AS avg_age_days
      |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_quarter""".stripMargin

  def mathFuncs(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(sum(sqrt(col("l_quantity"))), 2).as("sum_sqrt_qty"),
        round(avg(pow(col("l_discount"), 2)), 6).as("avg_disc_sq"),
        round(sum(log(col("l_extendedprice"))), 2).as("sum_ln_price"),
        round(max(abs(col("l_tax") - 0.04)), 4).as("max_tax_dev"),
        round(min(ceil(col("l_quantity")).cast("double")), 1).as("min_ceil_qty"))
      .orderBy("l_returnflag")

  val mathFuncsSql: String =
    """SELECT l_returnflag,
      |  round(sum(sqrt(l_quantity)), 2) AS sum_sqrt_qty,
      |  round(avg(pow(l_discount, 2)), 6) AS avg_disc_sq,
      |  round(sum(ln(l_extendedprice)), 2) AS sum_ln_price,
      |  round(max(abs(l_tax - 0.04)), 4) AS max_tax_dev,
      |  round(min(ceil(l_quantity)), 1) AS min_ceil_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** JSON extraction from `events.props` (the reference's JSON surface, O2,
    * applied field-wise instead of whole-record).
    */
  def jsonFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        sum("k").as("sum_k"),
        round(avg("k"), 2).as("avg_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_k_gt50"))
      .orderBy("event_type")

  val jsonFuncsSql: String =
    """SELECT event_type,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  round(avg(k), 2) AS avg_k,
      |  CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_k_gt50
      |FROM (SELECT event_type,
      |        TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Semi-structured VariantType surface (Spark 4): `parse_json` once into
    * the binary variant encoding, then typed `variant_get` extractions —
    * the 100 TB pattern for schemaless event payloads (parse once, extract
    * many; the variant column shreds/pushes down where parquet supports
    * it). Both failure modes are tolerated row-wise, never query-wise:
    * unparseable JSON → NULL variant (`try_parse_json`), wrong-typed or
    * missing `$.k` → NULL long (`try_variant_get`), and either counts into
    * `n_bad` — matching the oracle's TRY_CAST semantics exactly.
    */
  def variantJsonStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), try_parse_json(col("props")).as("v"))
      .select(col("event_type"),
        try_variant_get(col("v"), "$.k", "long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_bad"),
        sum("k").as("k_sum"),
        min("k").as("k_min"),
        max("k").as("k_max"))
      .orderBy("event_type")

  val variantJsonStatsSql: String =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
      |  CAST(sum(k) AS BIGINT) AS k_sum,
      |  CAST(min(k) AS BIGINT) AS k_min,
      |  CAST(max(k) AS BIGINT) AS k_max
      |FROM (SELECT event_type,
      |        TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Map-typed columns: parse `events.props` into a `map<string,string>`
    * and use map functions (keys, lookup) — completes the "Array / map fns"
    * row of SURVEY.md §2.2 alongside the array ops in the embedding suite.
    */
  def mapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).as("m"))
      .select(col("event_type"),
        map_keys(col("m")).as("ks"),
        element_at(col("m"), "k").cast("long").as("kv"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min(expr("ks[0]")).as("first_key"),
        max(size(col("ks"))).as("max_n_keys"),
        sum("kv").as("sum_k"))
      .orderBy("event_type")

  val mapFuncsSql: String =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(json_keys(props)[1]) AS first_key,
      |  CAST(max(len(json_keys(props))) AS INTEGER) AS max_n_keys,
      |  CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Higher-order array functions — the lambda surface (`transform` /
    * `filter` / `exists` / `slice` / `sort_array` / `array_join`) over the
    * per-document token array, completing the array half of the "Array /
    * map fns" §2.2 row (DuckDB mirror: `list_transform` / `list_filter` /
    * `list_sort` / slicing / `array_to_string`). All lambdas run inside
    * whole-stage codegen on one narrow scan: no shuffle until the final
    * presentation sort, so the shape is a pure map stage at any corpus
    * size. Array-valued intermediates are folded to scalars (joined
    * string / counts / bool) before emit per the oracle-parity rules.
    */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tok"),
        size(expr("filter(toks, t -> length(t) > 4)")).as("n_long"),
        expr("exists(toks, t -> length(t) > 8)").as("has_rare"),
        array_join(expr("transform(slice(toks, 1, 5), t -> string(length(t)))"),
          ",").as("head_lens"),
        array_join(sort_array(expr("slice(toks, 1, 5)")), ",").as("head_sorted"))
      .orderBy("doc_id")

  val arrayFuncsSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS INTEGER) AS n_tok,
      |  CAST(len(list_filter(toks, t -> length(t) > 4)) AS INTEGER) AS n_long,
      |  len(list_filter(toks, t -> length(t) > 8)) > 0 AS has_rare,
      |  array_to_string(list_transform(toks[1:5], t -> CAST(length(t) AS VARCHAR)), ',') AS head_lens,
      |  array_to_string(list_sort(toks[1:5]), ',') AS head_sorted
      |FROM t ORDER BY doc_id""".stripMargin

  def caseBuckets(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .select(
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
      .orderBy("bucket")

  val caseBucketsSql: String =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
      |            WHEN o_totalprice < 150000 THEN 'mid'
      |            ELSE 'high' END AS bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(avg(o_totalprice), 2) AS avg_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`); the approximate-sketch sibling is
    * `percentile_approx` inside `approxDistinct`-style rows-only checks.
    */
  def percentileExact(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.95)"), 4).as("p95_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
      .orderBy("l_returnflag")

  val percentileExactSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
      |  round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def aggStats(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .groupBy("l_linestatus")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"))
      .orderBy("l_linestatus")

  val aggStatsSql: String =
    """SELECT l_linestatus,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
      |  round(min(l_extendedprice), 2) AS min_price,
      |  round(max(l_extendedprice), 2) AS max_price
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Scalar subqueries through the SQL surface — one uncorrelated (global
    * average threshold) and one correlated (per-order line average, which
    * Catalyst decorrelates into a join; SURVEY.md §4's "subquery
    * decorrelation" row).
    */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    ord(s, d).createOrReplaceTempView("orders_v")
    li(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT o.o_orderkey, o.o_totalprice,
        |  round((SELECT avg(l.l_quantity) FROM lineitem_v l
        |         WHERE l.l_orderkey = o.o_orderkey), 4) AS avg_line_qty
        |FROM orders_v o
        |WHERE o.o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders_v)
        |ORDER BY o.o_orderkey""".stripMargin)
  }

  val scalarSubquerySql: String =
    """SELECT o.o_orderkey, o.o_totalprice,
      |  round((SELECT avg(l.l_quantity) FROM lineitem l
      |         WHERE l.l_orderkey = o.o_orderkey), 4) AS avg_line_qty
      |FROM orders o
      |WHERE o.o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
      |ORDER BY o.o_orderkey""".stripMargin

  /** Pivot (wide aggregation): per-user event counts spread over event-type
    * columns. Values are pinned so the output schema is static — at scale a
    * dynamic pivot would force an extra distinct-values job.
    */
  def pivotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val pivotEventsSql: String =
    """SELECT user_id,
      |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
      |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
      |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
      |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Unpivot (melt): yearly order metrics back to long form. */
  def unpivotMetrics(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum("o_totalprice"), 2).as("sum_price"),
        count(lit(1)).cast("double").as("n_orders"))
      .unpivot(Array(col("o_year")), Array(col("sum_price"), col("n_orders")),
        "metric", "value")
      .orderBy("o_year", "metric")

  val unpivotMetricsSql: String =
    """WITH y AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |    round(sum(o_totalprice), 2) AS sum_price,
      |    CAST(count(*) AS DOUBLE) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT o_year, 'sum_price' AS metric, sum_price AS value FROM y
      |UNION ALL
      |SELECT o_year, 'n_orders' AS metric, n_orders AS value FROM y
      |ORDER BY o_year, metric""".stripMargin

  // ------------------------------------------------------- window analytics
  /** Analytic window-function breadth beyond `window_rank`: ntile,
    * percent_rank, cume_dist, lead, first_value, and a bounded ROWS frame.
    * percent_rank/cume_dist are emitted as raw doubles — both engines
    * compute the same exact integer ratio in IEEE double, so the values are
    * bit-identical without rounding (rounding would reintroduce tie risk).
    */
  def windowAnalytics(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    ord(s, d).filter(col("o_custkey") < 200)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        first("o_totalprice")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_price"),
        max("o_totalprice").over(w.rowsBetween(-2, 0)).as("max3_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val windowAnalyticsSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  first_value(o_totalprice) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
      |  max(o_totalprice) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3_price
      |FROM orders WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ------------------------------------------------------ EXISTS subqueries
  /** Correlated EXISTS / NOT EXISTS (decorrelated by Catalyst into
    * semi/anti joins): customers who have orders but none above the
    * threshold. SQL-surface coverage beyond the DataFrame-level
    * `join_semi`/`join_anti`.
    */
  def subqueryExists(s: SparkSession, d: String): DataFrame = {
    cust(s, d).createOrReplaceTempView("customer_v")
    ord(s, d).createOrReplaceTempView("orders_ev")
    s.sql(
      """SELECT c.c_custkey, c.c_name
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_ev o
        |              WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders_ev o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 250000)
        |ORDER BY c.c_custkey""".stripMargin)
  }

  val subqueryExistsSql: String =
    """SELECT c.c_custkey, c.c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 250000)
      |ORDER BY c.c_custkey""".stripMargin

  // ---------------------------------------------------------- full outer join
  /** Full outer join: per-id event activity vs order activity, ids present
    * on either side survive with zero-filled counts. Completes the join-type
    * matrix (inner/left/semi/anti/range/as-of elsewhere).
    */
  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") < 100)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val oc = ord(s, d).filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    ev.join(oc, col("user_id") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("user_id"), col("o_custkey")).as("id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("id")
  }

  val joinFullOuterSql: String =
    """WITH ev AS (
      |  SELECT user_id, count(*) AS n_events FROM events
      |  WHERE user_id < 100 GROUP BY 1),
      |oc AS (
      |  SELECT o_custkey, count(*) AS n_orders FROM orders
      |  WHERE o_custkey < 100 GROUP BY 1)
      |SELECT coalesce(ev.user_id, oc.o_custkey) AS id,
      |  CAST(coalesce(ev.n_events, 0) AS BIGINT) AS n_events,
      |  CAST(coalesce(oc.n_orders, 0) AS BIGINT) AS n_orders
      |FROM ev FULL OUTER JOIN oc ON ev.user_id = oc.o_custkey
      |ORDER BY id""".stripMargin

  // ------------------------------------------------------------ group concat
  /** Ordered string aggregation (group-concat): per region, the sorted list
    * of its nations. `collect_list` + `sort_array` + `concat_ws` — the
    * deterministic form (an unsorted collect would be partition-order
    * dependent and unreproducible across engines or runs).
    */
  def groupConcat(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name")

  val groupConcatSql: String =
    """SELECT r_name,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  CAST(count(*) AS BIGINT) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ------------------------------------------------------------- hash split
  /** Deterministic train/val/test split (80/10/10) by portable content
    * hash of the document id — the reservoir-free sampling a 100 TB corpus
    * needs: any worker can assign any row's split independently, the
    * assignment is stable across runs and engines, and no shuffle happens
    * until the tiny audit aggregate.
    */
  /** The 80/10/10 portable-hash split rule — ONE definition shared by
    * [[sampleSplit]] (doc-keyed) and `Dedup.splitLeakageSafe` (cluster-
    * keyed, whose `naive_split` audit column is only meaningful while it
    * stays bit-identical to this rule).
    */
  private[operators] def splitOf(key: Column): Column = {
    val b = graft.functions.Portable.hash28(key.cast("string")) % 10
    when(b < 8, "train").when(b === 8, "val").otherwise("test")
  }

  /** SQL twin of [[splitOf]] over a precomputed `hash28 % 10` bucket. */
  private[operators] def splitCaseSql(bucket: String): String =
    s"CASE WHEN $bucket < 8 THEN 'train' WHEN $bucket = 8 THEN 'val' ELSE 'test' END"

  def sampleSplit(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("doc_id"), splitOf(col("doc_id")).as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
      .orderBy("split")
  }

  val sampleSplitSql: String =
    s"""WITH b AS (
       |  SELECT doc_id,
       |    ${graft.functions.Portable.hash28Sql("doc_id::VARCHAR")} % 10 AS bucket
       |  FROM documents)
       |SELECT ${splitCaseSql("bucket")} AS split,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
       |FROM b GROUP BY 1 ORDER BY split""".stripMargin

  // ------------------------------------------------------ stratified sample
  /** Deterministic stratified sample: within each language stratum keep the
    * 20% of documents whose id-hash bucket is below 2 (of 10) — per-stratum
    * rates without a shuffle (the hash decides membership row-locally; the
    * audit aggregate is the only exchange). The companion of
    * [[sampleSplit]]: same portable hash, conditioned per class, which is
    * how a 100 TB corpus balances classes without a global sort or
    * per-class reservoirs.
    */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val bucket = graft.functions.Portable.hash28(col("doc_id").cast("string")) % 10
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), (bucket < 2).as("sampled"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
        min(when(col("sampled"), col("doc_id"))).as("first_sampled_id"))
      .orderBy("lang")
  }

  val sampleStratifiedSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, lang,
       |    ${graft.functions.Portable.hash28Sql("doc_id::VARCHAR")} % 10 < 2 AS sampled
       |  FROM documents)
       |SELECT lang,
       |  CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |  min(CASE WHEN sampled THEN doc_id END) AS first_sampled_id
       |FROM b GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------ bottom-k sample
  /** Consistent bottom-k sampling: per language stratum, the k=5 documents
    * with the smallest (portable id-hash, doc_id) — an exact uniform
    * without-replacement sample whose membership is a pure function of the
    * ids. Unlike a reservoir, the bottom-k summary is MERGEABLE: the
    * bottom-k of a union is the bottom-k of each side's bottom-k, so
    * per-partition (and per-batch, for incremental corpora) pre-pruning to
    * k rows is lossless. Catalyst plans the rank filter as
    * `WindowGroupLimit`, which performs exactly that map-side prune —
    * each task forwards ≤ k rows per group to the single `lang` shuffle,
    * so at 100 TB the exchange carries O(groups × k), not the corpus.
    */
  def bottomkSample(s: SparkSession, d: String): DataFrame = {
    val h = graft.functions.Portable.hash28(col("doc_id").cast("string"))
    val w = Window.partitionBy("lang").orderBy("h", "doc_id")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= 5)
      .select("lang", "pos", "doc_id", "h")
      .orderBy("lang", "pos")
  }

  val bottomkSampleSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, lang,
       |    ${graft.functions.Portable.hash28Sql("doc_id::VARCHAR")} AS h
       |  FROM documents),
       |ranked AS (
       |  SELECT lang, doc_id, h,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
       |         AS INTEGER) AS pos
       |  FROM b)
       |SELECT lang, pos, doc_id, h FROM ranked
       |WHERE pos <= 5 ORDER BY lang, pos""".stripMargin

  // ------------------------------------------------------ approx percentile
  /** Sketch-based percentile (`percentile_approx`, Greenwald-Khanna),
    * oracle-closed by the exact-twin + verdict-literal pattern
    * (`hll_union_sources`): the row carries the exact interpolated
    * percentiles (DuckDB `quantile_cont` reproduces them — the
    * `percentile_exact` equivalence) plus boolean verdicts that each
    * GK estimate sits within 1% of its exact twin (the bound the
    * `OperatorSpec` sketch-contract test has always asserted; accuracy
    * 1000 ⇒ rank error ≤ 0.1%, comfortably inside). Verdicts compute on
    * the UNROUNDED values; the engine-specific sketch estimates stay out
    * of the compared frame. At 100 TB the sketch is the only viable
    * path: fixed memory per group, one pass, mergeable partials.
    */
  def percentileApprox(s: SparkSession, d: String): DataFrame =
    li(s, d).groupBy("l_returnflag")
      .agg(
        expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("p50_approx"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
        expr("percentile_approx(l_extendedprice, 0.95, 1000)").as("p95_approx"),
        expr("percentile(l_extendedprice, 0.95)").as("p95_exact"))
      .select(
        col("l_returnflag"),
        round(col("p50_exact"), 2).as("p50_exact"),
        round(col("p95_exact"), 2).as("p95_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <=
          abs(col("p50_exact")) * 0.01).as("p50_in_bound"),
        (abs(col("p95_approx") - col("p95_exact")) <=
          abs(col("p95_exact")) * 0.01).as("p95_in_bound"))
      .orderBy("l_returnflag")

  val percentileApproxSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50_exact,
      |  round(quantile_cont(l_extendedprice, 0.95), 2) AS p95_exact,
      |  TRUE AS p50_in_bound,
      |  TRUE AS p95_in_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Quantiles via the mergeable t-digest UDAF
    * ([[graft.functions.TDigestAggregator]]), oracle-closed by the
    * exact-twin + verdict-literal pattern (`hll_union_sources`): the row
    * carries the exact interpolated percentiles (DuckDB `quantile_cont`)
    * plus boolean verdicts that each t-digest estimate sits within 1% of
    * its exact twin — the bound the `OperatorSpec` error test asserts,
    * now also enforced by the driver's hash compare (a drifting digest
    * flips a verdict to false and the row goes red). Verdicts compute on
    * the unrounded values; the digest centroids themselves are
    * engine-specific and stay out of the compared frame. The parallelize
    * forces a multi-partition plan so partial digests genuinely merge.
    */
  def percentileTdigest(s: SparkSession, d: String): DataFrame = {
    val td = udaf(new graft.functions.TDigestAggregator(Seq(0.5, 0.95), 100))
    Tables.parallelize(s, li(s, d).select(col("l_returnflag"), col("l_extendedprice")))
      .groupBy("l_returnflag")
      .agg(
        td(col("l_extendedprice")).as("qs"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
        expr("percentile(l_extendedprice, 0.95)").as("p95_exact"))
      .select(
        col("l_returnflag"),
        round(col("p50_exact"), 2).as("p50_exact"),
        round(col("p95_exact"), 2).as("p95_exact"),
        (abs(element_at(col("qs"), 1) - col("p50_exact")) <=
          abs(col("p50_exact")) * 0.01).as("p50_in_bound"),
        (abs(element_at(col("qs"), 2) - col("p95_exact")) <=
          abs(col("p95_exact")) * 0.01).as("p95_in_bound"))
      .orderBy("l_returnflag")
  }

  val percentileTdigestSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50_exact,
      |  round(quantile_cont(l_extendedprice, 0.95), 2) AS p95_exact,
      |  TRUE AS p50_in_bound,
      |  TRUE AS p95_in_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------- merge / upsert
  /** CDC merge (SQL MERGE / upsert semantics without a table format): apply
    * a change batch — updates (op U, re-price ×1.1), deletes (op D),
    * inserts (op I, new keys) — to an orders snapshot. Spark-first shape:
    * the merged relation is `snapshot ANTI-JOIN changes` (rows the batch
    * does not touch) unioned with the batch's surviving U/I rows — ONE
    * equi-key wide edge total. At 100 TB the change batch is typically
    * tiny relative to the snapshot, so Catalyst broadcasts it and the
    * snapshot never shuffles; if a backfill-sized batch outgrows the
    * threshold, AQE degrades to a shuffled anti join instead of failing —
    * the q18/dedup_incremental posture, nothing forced. Emitted as
    * per-provenance aggregates (kept / updated / inserted; the deleted
    * mass is provably absent) with cent-integer price sums so both
    * engines hash identical values.
    */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val snapshot = orders.filter(col("o_orderkey") % 10 < 8)
    val changes = orders.filter(expr("o_orderkey % 10 IN (0, 4, 6, 8)"))
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 10 === 6, "D")
          .when(col("o_orderkey") % 10 === 8, "I")
          .otherwise("U").as("op"),
        when(col("o_orderkey") % 10 === 8, col("o_totalprice"))
          .otherwise(col("o_totalprice") * 1.1).as("new_price"))
    val kept = snapshot.join(changes, Seq("o_orderkey"), "left_anti")
      .select(lit("kept").as("src"), col("o_totalprice").as("price"))
    val applied = changes.filter(col("op") =!= "D")
      .select(
        when(col("op") === "I", "inserted").otherwise("updated").as("src"),
        col("new_price").as("price"))
    kept.unionAll(applied)
      .groupBy("src")
      .agg(
        count(lit(1)).as("n_rows"),
        // truncating cast, not round: no decimal-tie semantics for the
        // engines to disagree on (the embedding_quantize contract)
        sum((col("price") * 100).cast("long")).as("sum_cents"))
      .orderBy("src")
  }

  val mergeUpsertSql: String =
    """WITH snapshot AS (
      |  SELECT * FROM orders WHERE o_orderkey % 10 < 8),
      |changes AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 10 = 6 THEN 'D'
      |         WHEN o_orderkey % 10 = 8 THEN 'I' ELSE 'U' END AS op,
      |    CASE WHEN o_orderkey % 10 = 8 THEN o_totalprice
      |         ELSE o_totalprice * 1.1 END AS new_price
      |  FROM orders WHERE o_orderkey % 10 IN (0, 4, 6, 8)),
      |merged AS (
      |  SELECT 'kept' AS src, o_totalprice AS price FROM snapshot
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
      |  UNION ALL
      |  SELECT CASE WHEN op = 'I' THEN 'inserted' ELSE 'updated' END AS src,
      |         new_price AS price
      |  FROM changes WHERE op <> 'D')
      |SELECT src,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(trunc(price * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM merged GROUP BY src ORDER BY src""".stripMargin

  /** Generic CDC ordered-log apply — the reusable operator behind
    * `cdc_apply_log`: collapse a `(key, seq, op, payload…)` changelog to
    * each key's LAST change, then merge onto the snapshot. 'D' drops the
    * key, any other op upserts its payload, untouched snapshot rows pass
    * through. Provenance lands in `__cdc_src` ('kept' | 'updated' |
    * 'inserted' — decided by snapshot PRESENCE, never by trusting the op
    * marker). Log payload columns must carry the snapshot's payload
    * column names (enforced loudly), and a null op value raises at
    * runtime — the merge reads a null `__op` as "untouched", so a silent
    * pass-through would misclassify the row.
    *
    * Scale shape: the last-change reduction is one `max(struct(seq, op,
    * payload…))` aggregate — partial+final (map-side combinable; Spark
    * plans SortAggregate for struct buffers, but the partial_max still
    * collapses each key to ONE row before the shuffle), NEVER a window
    * over raw log rows — followed by one full-outer merge on the same
    * key clustering. Duplicate sequence numbers resolve by the struct's
    * lexicographic order (seq, then op, then payload) — deterministic
    * run-to-run, but semantically arbitrary, so give changes unique
    * seqs. `CdcProps` pins the operator against a sequential in-memory
    * fold under random op interleavings, duplicate seqs included.
    */
  def applyChangeLog(snapshot: DataFrame, log: DataFrame, key: String,
      seqCol: String, opCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == key).toSeq
    val logPayload = log.columns.filterNot(Set(key, seqCol, opCol)).toSeq
    require(logPayload.sorted == payload.sorted,
      s"log payload columns ${logPayload.mkString(",")} must equal snapshot " +
        s"payload columns ${payload.mkString(",")}")
    require(!snapshot.columns.contains("__cdc_src"),
      "snapshot may not already carry the reserved column __cdc_src")
    val last = log.groupBy(col(key))
      .agg(max(struct((seqCol +: opCol +: payload).map(col): _*)).as("__c"),
        // a null op is invalid input, not a silent no-op: 'kept' is how
        // the merge reads a null __op, so letting one through would
        // misclassify the row — refuse at runtime, every log row checked
        max(col(opCol).isNull).as("__badop"))
      .select(col(key),
        when(col("__badop"), raise_error(
          lit(s"applyChangeLog: null $opCol in changelog")))
          .otherwise(col(s"__c.$opCol")).as("__op"),
        struct(payload.map(c => col(s"__c.$c").as(c)): _*).as("__new"))
    val snap = snapshot
      .select(col(key), struct(payload.map(col): _*).as("__old"))
    val merged = snap.join(last, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .withColumn("__cdc_src",
        when(col("__op").isNull, "kept")
          .when(col("__old").isNotNull, "updated")
          .otherwise("inserted"))
      .withColumn("__row",
        when(col("__op").isNull, col("__old")).otherwise(col("__new")))
    merged.select(
      col(key) +: payload.map(c => col(s"__row.$c").as(c)) :+ col("__cdc_src"): _*)
  }

  /** CDC LOG apply — the multi-change companion of [[mergeUpsert]] (and
    * the batch twin of `Streams.upsertBatch(seqCol = ...)`): the change
    * relation is an ordered LOG that can carry several changes per key
    * (U then U, U then D, I then nothing), and each key's LAST change by
    * sequence number wins before the single-edge merge — the
    * [[applyChangeLog]] operator, whose last-change reduction is a
    * map-side-combinable hash aggregate chained on the merge's own key
    * exchange (no window sort). Net effects exercised: double-U keys
    * take the second price, U-then-D keys vanish, single-I keys insert.
    */
  def cdcApplyLog(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val snapshot = orders.filter(col("o_orderkey") % 10 < 8)
      .select(col("o_orderkey"), col("o_totalprice").as("price"))
    val log = orders.filter(expr("o_orderkey % 10 IN (0, 4, 8)"))
      .select(col("o_orderkey"), col("o_totalprice"),
        explode(array(
          struct(lit(1L).as("seq"),
            when(col("o_orderkey") % 10 === 8, "I").otherwise("U").as("op"),
            (col("o_totalprice") * 1.05).as("new_price")),
          struct(lit(2L).as("seq"),
            when(col("o_orderkey") % 10 === 4, "D").otherwise("U").as("op"),
            when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 1.2)
              .otherwise(col("o_totalprice") * 1.3).as("new_price")))).as("c"))
      // inserted keys (% 10 = 8) carry a single-entry log
      .filter(!(col("o_orderkey") % 10 === 8 && col("c.seq") === 2L))
      .select(col("o_orderkey"), col("c.seq"), col("c.op"),
        col("c.new_price").as("price"))
    applyChangeLog(snapshot, log, "o_orderkey", "seq", "op")
      .groupBy(col("__cdc_src").as("src"))
      .agg(count(lit(1)).as("n_rows"),
        sum((col("price") * 100).cast("long")).as("sum_cents"))
      .orderBy("src")
  }

  val cdcApplyLogSql: String =
    """WITH snapshot AS (
      |  SELECT * FROM orders WHERE o_orderkey % 10 < 8),
      |log0 AS (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 10 IN (0, 4, 8)),
      |changelog AS (
      |  SELECT o_orderkey, 1 AS seq,
      |    CASE WHEN o_orderkey % 10 = 8 THEN 'I' ELSE 'U' END AS op,
      |    o_totalprice * 1.05 AS new_price
      |  FROM log0
      |  UNION ALL
      |  SELECT o_orderkey, 2,
      |    CASE WHEN o_orderkey % 10 = 4 THEN 'D' ELSE 'U' END,
      |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.2
      |         ELSE o_totalprice * 1.3 END
      |  FROM log0 WHERE o_orderkey % 10 <> 8),
      |last AS (
      |  SELECT o_orderkey, op, new_price FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
      |    FROM changelog)
      |  WHERE rn = 1),
      |merged AS (
      |  SELECT 'kept' AS src, o_totalprice AS price FROM snapshot
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM last)
      |  UNION ALL
      |  SELECT CASE WHEN op = 'I' THEN 'inserted' ELSE 'updated' END AS src,
      |         new_price AS price
      |  FROM last WHERE op <> 'D')
      |SELECT src,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(trunc(price * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM merged GROUP BY src ORDER BY src""".stripMargin

  // ---------------------------------------------------------------- SCD2
  /** SCD2 (type-2 slowly-changing-dimension) history build — the batch
    * companion of [[mergeUpsert]]: each customer's order-priority history
    * collapsed into effective-dated rows. Consecutive orders with the same
    * priority fold into one version (lag-compare flag → running sum =
    * version id, the `sessionize_gaps` machinery driven by value change
    * instead of time gap); each version carries
    * `[valid_from, valid_to)` with `valid_to` = next version's start
    * (NULL ⇒ current). Ties on order date break by o_orderkey, so version
    * boundaries are deterministic in both engines.
    *
    * Scale posture: one `o_custkey` shuffle feeds the lag, the running
    * sum, the fold-to-versions aggregate, AND the lead — Catalyst chains
    * all four on the same `HashPartitioning(o_custkey)` with per-key
    * sorts, no second exchange. Work is per-dimension-key history length,
    * never cross-key — the layout a 100 TB dimension build wants.
    */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    val byKey = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val bySeg = Window.partitionBy("o_custkey").orderBy("seg")
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority").as("prio"))
      .withColumn("chg",
        when(lag("prio", 1).over(byKey).isNull ||
          lag("prio", 1).over(byKey) =!= col("prio"), 1L).otherwise(0L))
      .withColumn("seg", sum("chg").over(byKey))
      .groupBy("o_custkey", "seg")
      .agg(first("prio").as("prio"),
        min("o_orderdate").as("valid_from"),
        count(lit(1)).as("n_orders"))
      .withColumn("valid_to", lead("valid_from", 1).over(bySeg))
      .select(col("o_custkey"), col("seg").as("version"), col("prio"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("n_orders"))
      .orderBy("o_custkey", "version")
  }

  val scd2HistorySql: String =
    """WITH flagged AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority AS prio,
      |    CASE WHEN lag(o_orderpriority, 1) OVER w IS NULL
      |           OR lag(o_orderpriority, 1) OVER w <> o_orderpriority
      |         THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |versions AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, prio,
      |    sum(chg) OVER (PARTITION BY o_custkey
      |                   ORDER BY o_orderdate, o_orderkey) AS seg
      |  FROM flagged),
      |folded AS (
      |  SELECT o_custkey, CAST(seg AS BIGINT) AS version,
      |    min(prio) AS prio, min(o_orderdate) AS valid_from,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM versions GROUP BY o_custkey, seg)
      |SELECT o_custkey, version, prio, valid_from,
      |  lead(valid_from, 1) OVER (PARTITION BY o_custkey ORDER BY version)
      |    AS valid_to,
      |  lead(valid_from, 1) OVER (PARTITION BY o_custkey ORDER BY version)
      |    IS NULL AS is_current,
      |  n_orders
      |FROM folded ORDER BY o_custkey, version""".stripMargin

  // ---------------------------------------------------------------- registry
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_upsert" -> (mergeUpsert _),
    "cdc_apply_log" -> (cdcApplyLog _),
    "scd2_history" -> (scd2History _),
    "percentile_tdigest" -> (percentileTdigest _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_top_orders" -> (q3TopOrders _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q6_filter_agg" -> (q6FilterAgg _),
    "q18_large_orders" -> (q18LargeOrders _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "topk_orders" -> (topkOrders _),
    "distinct_agg" -> (distinctAgg _),
    "approx_distinct" -> (approxDistinct _),
    "hll_union_sources" -> (hllUnionSources _),
    "cms_user_counts" -> (cmsUserCounts _),
    "setops" -> (setOps _),
    "window_rank" -> (windowRank _),
    "grouping_sets" -> (groupingSets _),
    "rollup_sales" -> (rollupSales _),
    "cube_sales" -> (cubeSales _),
    "string_funcs" -> (stringFuncs _),
    "date_funcs" -> (dateFuncs _),
    "math_funcs" -> (mathFuncs _),
    "json_funcs" -> (jsonFuncs _),
    "variant_json_stats" -> (variantJsonStats _),
    "map_funcs" -> (mapFuncs _),
    "array_funcs" -> (arrayFuncs _),
    "case_buckets" -> (caseBuckets _),
    "percentile_exact" -> (percentileExact _),
    "scalar_subquery" -> (scalarSubquery _),
    "window_analytics" -> (windowAnalytics _),
    "subquery_exists" -> (subqueryExists _),
    "join_full_outer" -> (joinFullOuter _),
    "group_concat" -> (groupConcat _),
    "sample_split" -> (sampleSplit _),
    "sample_stratified" -> (sampleStratified _),
    "bottomk_sample" -> (bottomkSample _),
    "percentile_approx_sketch" -> (percentileApprox _),
    "pivot_events" -> (pivotEvents _),
    "unpivot_metrics" -> (unpivotMetrics _),
    "agg_stats" -> (aggStats _))

  def oracles: Map[String, String] = Map(
    "approx_distinct" -> approxDistinctSql,
    "percentile_approx_sketch" -> percentileApproxSql,
    "percentile_tdigest" -> percentileTdigestSql,
    "hll_union_sources" -> hllUnionSourcesSql,
    "cms_user_counts" -> cmsUserCountsSql,
    "merge_upsert" -> mergeUpsertSql,
    "cdc_apply_log" -> cdcApplyLogSql,
    "scd2_history" -> scd2HistorySql,
    "q1_pricing_summary" -> q1Sql,
    "q3_top_orders" -> q3Sql,
    "q5_nation_revenue" -> q5Sql,
    "q6_filter_agg" -> q6Sql,
    "q18_large_orders" -> q18Sql,
    "join_semi" -> joinSemiSql,
    "join_anti" -> joinAntiSql,
    "topk_orders" -> topkOrdersSql,
    "distinct_agg" -> distinctAggSql,
    "setops" -> setOpsSql,
    "window_rank" -> windowRankSql,
    "grouping_sets" -> groupingSetsSql,
    "rollup_sales" -> rollupSalesSql,
    "cube_sales" -> cubeSalesSql,
    "string_funcs" -> stringFuncsSql,
    "date_funcs" -> dateFuncsSql,
    "math_funcs" -> mathFuncsSql,
    "json_funcs" -> jsonFuncsSql,
    "variant_json_stats" -> variantJsonStatsSql,
    "map_funcs" -> mapFuncsSql,
    "array_funcs" -> arrayFuncsSql,
    "case_buckets" -> caseBucketsSql,
    "percentile_exact" -> percentileExactSql,
    "scalar_subquery" -> scalarSubquerySql,
    "window_analytics" -> windowAnalyticsSql,
    "subquery_exists" -> subqueryExistsSql,
    "join_full_outer" -> joinFullOuterSql,
    "group_concat" -> groupConcatSql,
    "sample_split" -> sampleSplitSql,
    "sample_stratified" -> sampleStratifiedSql,
    "bottomk_sample" -> bottomkSampleSql,
    "pivot_events" -> pivotEventsSql,
    "unpivot_metrics" -> unpivotMetricsSql,
    "agg_stats" -> aggStatsSql)
}
