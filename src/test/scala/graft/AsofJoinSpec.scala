package graft

import graft.plans.{AsofJoinExec, GraftStrategies}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The native as-of join (marker predicate → strategy → SparkPlan):
  * planner wiring, merge semantics at the edges the fixture can't pin
  * (ties, no-match, right duplicates), and agreement with an independent
  * per-row computation. Exact-value correctness at fixture scale is the
  * driver's DuckDB oracle (`asof_join_native`).
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize any adaptive plan before inspecting it
    df.queryExecution.executedPlan.toString
  }

  /** True when either native exec (sort-merge `AsofJoin` or
    * `AsofBroadcastJoin`) appears — which one is the size rule's choice;
    * selection itself is pinned by the dedicated selection tests. */
  private def asofPlanned(plan: String): Boolean =
    plan.contains("AsofJoin [") || plan.contains("AsofBroadcastJoin [")

  test("strategy plans the marker join onto a native asof exec") {
    val df = operators.TemporalJoins.asofJoinNative(spark, sf)
    assert(asofPlanned(planOf(df)),
      "asof_le join condition was not planned by AsofJoinStrategy")
  }

  test("merge semantics: latest <=, inclusive ties, null before first match, dup keys collapse") {
    GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val probes = Seq(
      // (id, key, t)
      (1L, 10L, 100L), // before any right row for the key -> null
      (2L, 10L, 200L), // exact tie with a right row at 200 -> inclusive
      (3L, 10L, 350L), // between right rows -> latest prior (300), not 200
      (4L, 99L, 500L), // key absent on the right -> null
      (5L, 20L, 999L)  // right has DUPLICATE times; exactly one output row
    ).toDF("id", "k", "t")
    val quotes = Seq(
      (10L, 200L, "a"),
      (10L, 300L, "b"),
      (10L, 400L, "c"), // after every probe for key 10 -> never matched
      (20L, 50L, "x1"),
      (20L, 50L, "x2")  // duplicate (key, time): one must win, no fan-out
    ).toDF("rk", "rt", "tag")
    val out = probes
      .join(quotes, expr("k = rk AND asof_le(t, rt)"), "left")
      .select($"id", $"rt", $"tag")
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getAs[String]("tag"))).toMap
    assert(out.size == 5, "as-of must emit exactly one row per left row")
    assert(out(1L)._1.isEmpty)
    assert(out(2L)._1.contains(200L) && out(2L)._2 == "a")
    assert(out(3L)._1.contains(300L) && out(3L)._2 == "b")
    assert(out(4L)._1.isEmpty)
    // duplicate (rk, rt): the matched TIME is deterministic; the payload
    // among exact ties is documented as unspecified (non-stable sort)
    assert(out(5L)._1.contains(50L) && Set("x1", "x2").contains(out(5L)._2))
  }

  test("timestamp-typed time columns plan and merge identically") {
    GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val l = Seq((1L, 7L, Timestamp.valueOf("2024-01-01 10:00:30")))
      .toDF("id", "k", "t")
    val r = Seq(
      (7L, Timestamp.valueOf("2024-01-01 10:00:00"), "early"),
      (7L, Timestamp.valueOf("2024-01-01 10:00:30"), "tie"),
      (7L, Timestamp.valueOf("2024-01-01 10:01:00"), "late"))
      .toDF("rk", "rt", "tag")
    val df = l.join(r, expr("k = rk AND asof_le(t, rt)"), "left")
      .select($"id", $"tag")
    assert(asofPlanned(planOf(df)))
    assert(df.collect().map(_.getAs[String]("tag")).toSeq == Seq("tie"))
  }

  test("broadcast() hint plans the broadcast variant; results identical to the merge") {
    GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val probes = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 350L),
      (4L, 99L, 500L), (5L, 20L, 999L)).toDF("id", "k", "t")
    val quotes = Seq((10L, 200L, "a"), (10L, 300L, "b"), (10L, 400L, "c"),
      (20L, 50L, "x1"), (20L, 50L, "x2")).toDF("rk", "rt", "tag")
    def results(r: org.apache.spark.sql.DataFrame) = probes
      .join(r, expr("k = rk AND asof_le(t, rt)"), "left")
      .select($"id", $"rt").collect()
      .map(x => x.getAs[Long]("id") -> Option(x.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    val bdf = probes.join(broadcast(quotes), expr("k = rk AND asof_le(t, rt)"), "left")
    val plan = planOf(bdf)
    assert(plan.contains("AsofBroadcastJoin"), s"hinted join not broadcast-planned:\n$plan")
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("AsofJoinExec"))
    // force the merge exec on the unhinted leg: with auto-broadcast
    // selection a tiny right side would otherwise broadcast too
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val merged = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      results(quotes)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(results(broadcast(quotes)) == merged,
      "broadcast and merge variants disagree")
  }

  test("right side under autoBroadcastJoinThreshold auto-selects the broadcast variant") {
    GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val probes = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 999L))
      .toDF("id", "k", "t")
    val quotes = Seq((10L, 200L, "a"), (10L, 300L, "b"), (20L, 50L, "x"))
      .toDF("rk", "rt", "tag")
    val unhinted = probes.join(quotes, expr("k = rk AND asof_le(t, rt)"), "left")
    // NO hint: the JoinSelection size rule picks the broadcast exec
    val auto = planOf(unhinted)
    assert(auto.contains("AsofBroadcastJoin"),
      s"small unhinted right side not auto-broadcast:\n$auto")
    // threshold off: the same join plans the sort-merge exec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merge = planOf(
        probes.join(quotes, expr("k = rk AND asof_le(t, rt)"), "left"))
      assert(merge.contains("AsofJoin [") && !merge.contains("AsofBroadcastJoin"),
        s"threshold=-1 still broadcast-planned:\n$merge")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and the auto-broadcast results match the merge exec's (same rows as
    // the hinted-variant agreement above, re-checked on this shape)
    val got = unhinted.select($"id", $"rt").collect()
      .map(x => x.getAs[Long]("id") -> Option(x.get(1))).toMap
    assert(got == Map(1L -> None, 2L -> Some(200L), 3L -> Some(50L)))
  }

  test("hinted broadcast side over the documented row budget fails loudly, not OOM") {
    GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val probes = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val quotes = Seq((10L, 50L, "a"), (10L, 60L, "b"), (10L, 70L, "c"),
      (10L, 80L, "d"), (10L, 90L, "e")).toDF("rk", "rt", "tag")
    val prev = spark.conf.getOption(plans.AsofJoinStrategy.MaxBroadcastRowsKey)
    try {
      spark.conf.set(plans.AsofJoinStrategy.MaxBroadcastRowsKey, "3")
      val ex = intercept[Exception] {
        probes.join(broadcast(quotes), expr("k = rk AND asof_le(t, rt)"), "left")
          .collect()
      }
      // the diagnosis must name the budget conf and the fix
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      val all = messages(ex).mkString("\n")
      assert(all.contains(plans.AsofJoinStrategy.MaxBroadcastRowsKey) &&
        all.contains("remove the broadcast() hint"),
        s"budget violation not diagnosed:\n$all")
    } finally prev match {
      case Some(v) => spark.conf.set(plans.AsofJoinStrategy.MaxBroadcastRowsKey, v)
      case None => spark.conf.unset(plans.AsofJoinStrategy.MaxBroadcastRowsKey)
    }
  }

  test("auto-selected broadcast over the budget names the threshold fix, not a hint the user never wrote") {
    GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val probes = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    // NO broadcast() hint, and read via parquet so the relation has a
    // SIZE estimate but NO row-count statistic (a local relation knows
    // its row count, and the planner's veto would correctly keep the
    // merge plan — that path is the next test's subject)
    val dir = java.nio.file.Files.createTempDirectory("asof_auto_budget").toString
    Seq((10L, 50L, "a"), (10L, 60L, "b"), (10L, 70L, "c"),
      (10L, 80L, "d"), (10L, 90L, "e")).toDF("rk", "rt", "tag")
      .write.mode("overwrite").parquet(dir)
    val quotes = spark.read.parquet(dir)
    val prev = spark.conf.getOption(plans.AsofJoinStrategy.MaxBroadcastRowsKey)
    try {
      spark.conf.set(plans.AsofJoinStrategy.MaxBroadcastRowsKey, "3")
      val joined = probes.join(quotes, expr("k = rk AND asof_le(t, rt)"), "left")
      // inspect without executing (planOf's collect would throw here —
      // that throw is this test's subject)
      assert(joined.queryExecution.executedPlan.toString.contains("AsofBroadcastJoin"),
        "fixture no longer exercises the size-estimate selection path")
      val ex = intercept[Exception] { joined.collect() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      val all = messages(ex).mkString("\n")
      assert(all.contains(plans.AsofJoinStrategy.MaxBroadcastRowsKey) &&
        all.contains("autoBroadcastJoinThreshold") &&
        !all.contains("remove the broadcast() hint"),
        s"auto-selection budget violation mis-diagnosed:\n$all")
    } finally prev match {
      case Some(v) => spark.conf.set(plans.AsofJoinStrategy.MaxBroadcastRowsKey, v)
      case None => spark.conf.unset(plans.AsofJoinStrategy.MaxBroadcastRowsKey)
    }
  }

  test("size-estimate selection is vetoed when row stats already exceed the budget") {
    GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    // a compact table can sit under the BYTE threshold while holding more
    // ROWS than the index budget — with ANALYZE'd row stats visible, the
    // unhinted path must keep the merge plan instead of planning a
    // guaranteed runtime failure
    val name = "asof_veto_quotes"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    (0 until 500).map(i => (10L, i.toLong, s"q$i")).toDF("rk", "rt", "tag")
      .write.mode("overwrite").saveAsTable(name)
    spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
    val probes = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val prevBudget = spark.conf.getOption(plans.AsofJoinStrategy.MaxBroadcastRowsKey)
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true") // surfaces rowCount stats
      def planFor(): String = planOf(probes.join(
        spark.table(name), expr("k = rk AND asof_le(t, rt)"), "left"))
      spark.conf.set(plans.AsofJoinStrategy.MaxBroadcastRowsKey, "100")
      val vetoed = planFor()
      assert(vetoed.contains("AsofJoin [") && !vetoed.contains("AsofBroadcastJoin"),
        s"row-stats veto did not keep the merge plan:\n$vetoed")
      // same shape with the budget above the row count: broadcast again
      spark.conf.set(plans.AsofJoinStrategy.MaxBroadcastRowsKey, "100000")
      assert(planFor().contains("AsofBroadcastJoin"),
        "budget over the row count should restore the size-estimate selection")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      prevBudget match {
        case Some(v) => spark.conf.set(plans.AsofJoinStrategy.MaxBroadcastRowsKey, v)
        case None => spark.conf.unset(plans.AsofJoinStrategy.MaxBroadcastRowsKey)
      }
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("fixture agreement with an independent per-purchase computation") {
    val got = operators.TemporalJoins.asofJoinNative(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    // independent oracle: collect signups per user, scan per purchase
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es")).collect()
    val signups: Map[Long, Seq[Long]] = ev
      .filter(_.getAs[String]("event_type") == "signup")
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("es")).toSeq.sorted).toMap
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
    assert(purchases.nonEmpty && got.size == purchases.length)
    purchases.foreach { p =>
      val es = p.getAs[Long]("es")
      val expected = signups.getOrElse(p.getAs[Long]("user_id"), Seq.empty[Long])
        .filter(_ <= es).lastOption
      assert(got(p.getAs[Long]("event_id")) == expected,
        s"event ${p.getAs[Long]("event_id")}")
    }
  }

  test("unregistered strategy fails loudly, never silently fans out") {
    graft.functions.VecFunctions.register(spark)
    // a session WITHOUT the strategy: the Unevaluable marker must make the
    // query error, because planning it as a plain predicate would emit one
    // row per <=-match (wrong multiplicity)
    val bare = spark.newSession()
    graft.functions.VecFunctions.register(bare)
    import bare.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("rk", "rt")
    val ex = intercept[Exception] {
      l.join(r, expr("k = rk AND asof_le(t, rt)"), "left").collect()
    }
    assert(ex.getMessage != null)
  }

  test("bucketed pre-sorted inputs plan the native as-of with zero exchange and zero sort") {
    GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // since 3.0 Spark reports a bucketed scan's sortBy order only behind
      // this conf (and only when each bucket is one file) — same lever an
      // SMJ needs for full sort elision on bucketed inputs
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    spark.sql("DROP TABLE IF EXISTS asof_probes_b")
    spark.sql("DROP TABLE IF EXISTS asof_quotes_b")
    val probes = (0L until 400L).map(i => (i, i % 20L, i * 7L % 1000L))
      .toDF("id", "k", "t")
    val quotes = (0L until 100L).map(i => (i % 20L, i * 13L % 1000L, s"q$i"))
      .toDF("rk", "rt", "tag")
    // repartition by the bucket key first so each bucket is ONE file —
    // the condition under which the scan reports its sortBy ordering and
    // EnsureRequirements can elide the in-partition sorts too
    probes.repartition(4, col("k"))
      .write.format("parquet").bucketBy(4, "k").sortBy("k", "t")
      .mode("overwrite").saveAsTable("asof_probes_b")
    quotes.repartition(4, col("rk"))
      .write.format("parquet").bucketBy(4, "rk").sortBy("rk", "rt")
      .mode("overwrite").saveAsTable("asof_quotes_b")
    try {
      confs.foreach { case (c, v) => spark.conf.set(c, v) }
      val joined = spark.table("asof_probes_b")
        .join(spark.table("asof_quotes_b"), expr("k = rk AND asof_le(t, rt)"), "left")
      val rows = joined.collect()
      assert(rows.length == 400, "as-of multiplicity: one row per probe")
      val plan = joined.queryExecution.executedPlan
      val planStr = plan.toString
      assert(planStr.contains("AsofJoin"), planStr)
      // the 100 TB co-location story: pre-bucketed fact tables join as-of
      // with NO shuffle on either side, and the per-bucket sortBy order
      // satisfies requiredChildOrdering so no sort is inserted either —
      // the scan feeds the merge directly
      assert(!planStr.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed as-of join, got:\n$planStr")
      assert(!planStr.contains("Sort "),
        s"expected sort-free bucketed as-of join (sortBy order reused), got:\n$planStr")
      // operator metrics: output == probe count, matched == probes whose
      // key has any quote at or before their time (independent recompute).
      // collect() does not descend through AQE wrappers/query stages —
      // unwrap them explicitly
      def findExec(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[graft.plans.AsofJoinExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findExec(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findExec(q.plan)
        case e: graft.plans.AsofJoinExec =>
          e +: e.children.flatMap(findExec)
        case other => other.children.flatMap(findExec)
      }
      val exec = findExec(plan).head
      val quoteRows = quotes.collect()
      val expectMatched = probes.collect().count { p =>
        quoteRows.exists(q =>
          q.getLong(0) == p.getLong(1) && q.getLong(1) <= p.getLong(2))
      }
      assert(exec.metrics("numOutputRows").value == 400L)
      assert(exec.metrics("numMatchedRows").value == expectMatched.toLong,
        s"matched metric ${exec.metrics("numMatchedRows").value} != recomputed $expectMatched")
    } finally {
      prev.foreach {
        case (c, Some(v)) => spark.conf.set(c, v)
        case (c, None) => spark.conf.unset(c)
      }
      spark.sql("DROP TABLE IF EXISTS asof_probes_b")
      spark.sql("DROP TABLE IF EXISTS asof_quotes_b")
    }
  }

  test("constant / single-side conjuncts never become degenerate join keys") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val l = Seq((1L, 10L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L), (1L, 7L), (2L, 8L)).toDF("rk", "rt")
    // Catalyst's PushPredicateThroughJoin moves single-side conjuncts
    // (`rk = 1`, `rt > 6`) out of the join condition into child filters
    // before the strategy runs, so the strategy sees only the real
    // cross-relation equality — and the strategy's own nonEmpty-reference
    // guard backstops any constant equality that survives to planning
    // (without it, an empty reference set subsets both outputSets and the
    // constant would hash-cluster the whole right side onto one
    // partition). The queries must plan on the native exec and stay
    // semantically right: filters apply BEFORE the as-of match.
    val constDf = l.join(r, expr("k = rk AND rk = 1 AND asof_le(t, rt)"), "left")
    assert(asofPlanned(planOf(constDf)))
    assert(constDf.select("k", "rt").collect().map(r0 =>
      (r0.getLong(0), if (r0.isNullAt(1)) -1L else r0.getLong(1))).toSet ===
      Set((1L, 7L), (2L, -1L))) // k=2 filtered off the right -> null match
    val sideDf = l.join(r, expr("k = rk AND rt > 6 AND asof_le(t, rt)"), "left")
    assert(asofPlanned(planOf(sideDf)))
    assert(sideDf.select("k", "rt").collect().map(r0 =>
      (r0.getLong(0), if (r0.isNullAt(1)) -1L else r0.getLong(1))).toSet ===
      Set((1L, 7L), (2L, 8L))) // rt=5 excluded pre-join, so k=1 matches 7
  }

  test("composite keys: all equi-conjuncts cluster the native exec together") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val l = Seq((1L, 1L, 10L), (1L, 2L, 10L), (2L, 1L, 10L)).toDF("k1", "k2", "t")
    val r = Seq((1L, 1L, 5L), (1L, 2L, 7L), (1L, 2L, 11L), (2L, 2L, 6L))
      .toDF("rk1", "rk2", "rt")
    val df = l.join(r, expr("k1 = rk1 AND k2 = rk2 AND asof_le(t, rt)"), "left")
    assert(asofPlanned(planOf(df)))
    // (1,2) must NOT see (1,1)'s or (2,2)'s history — a partial-key
    // cluster would return 6 for (2,1) or 5 for (1,2)
    assert(df.select("k1", "k2", "rt").collect().map(r0 =>
      (r0.getLong(0), r0.getLong(1),
        if (r0.isNullAt(2)) -1L else r0.getLong(2))).toSet ===
      Set((1L, 1L, 5L), (1L, 2L, 7L), (2L, 1L, -1L)))
  }

  test("nearest pipeline re-uses the probe-side exchange: one hash exchange for two merge passes") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    def occurrences(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val r = Seq((1L, 5L), (2L, 25L)).toDF("rk", "rt")
    // merge-exec-specific claim: force the sort-merge path (the size rule
    // would broadcast these tiny local relations)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE's toString prints the plan twice (Final + Initial) — count only
    // the final section
    val planStr = try planOf(operators.TemporalJoins
      .asofNearest(l, r, Seq("k"), Seq("rk"), "t", "rt"))
      .split("== Initial Plan ==")(0)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    // two merge passes...
    assert(occurrences(planStr, "AsofJoin") == 2, planStr)
    // ...but only THREE hash exchanges: probe once + each right leg once.
    // AsofJoinExec reports outputPartitioning = left's, so the second
    // pass re-uses the first's probe-side clustering and inserts only a
    // Sort — the PLANS.md single-probe-exchange claim, pinned
    assert(occurrences(planStr, "Exchange hashpartitioning") == 3, planStr)
  }

  test("asofNearest refuses shared left/right column names loudly") {
    graft.plans.GraftStrategies.register(spark)
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    // the bare asof_le join fails on ambiguous references for the same
    // input; without the guard, nearest's restore-to-original-names
    // projection would instead silently OVERWRITE the left 'price'
    val l = Seq((1L, 10L, 99.0)).toDF("k", "t", "price")
    val r = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "price")
    val e = intercept[IllegalArgumentException] {
      operators.TemporalJoins.asofNearest(l, r, Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(e.getMessage.contains("price"), e.getMessage)
  }
}
