package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join shapes Spark has no dedicated operator for, composed from
  * built-ins the scalable way (builder prompt preference order (a):
  * compose existing ops):
  *
  *  - **Range join, binned**: a naive |t1−t2| ≤ δ theta join is a nested
  *    loop (O(n·m)); binning the time axis to δ-sized buckets turns it into
  *    an equi-join on the bucket id (each left row probes its 3 candidate
  *    buckets), which shuffles by bucket and scales linearly.
  *  - **As-of join**: "latest prior event" via union-tag + running-window
  *    max — one sort-based window per key, no join at all.
  */
object TemporalJoins {

  /** For each error event, the number of click events within ±60 s, via
    * minute-binning: each error probes bins {b−1, b, b+1}; a click lives in
    * exactly one bin, so each qualifying pair matches exactly once.
    */
  def rangeJoinBinned(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("es"),
        explode(array(
          (col("es") / 60).cast("long") - 1,
          (col("es") / 60).cast("long"),
          (col("es") / 60).cast("long") + 1)).as("bin"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("es").as("cs"), (col("es") / 60).cast("long").as("bin"))
    errors.join(clicks, Seq("bin"))
      .filter(abs(col("cs") - col("es")) <= 60)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_nearby_clicks"))
      .orderBy("event_id")
  }

  val rangeJoinBinnedSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events),
      |errors AS (
      |  SELECT event_id, es, unnest([es // 60 - 1, es // 60, es // 60 + 1]) AS bin
      |  FROM ev WHERE event_type = 'error'),
      |clicks AS (
      |  SELECT es AS cs, es // 60 AS bin FROM ev WHERE event_type = 'click')
      |SELECT e.event_id, CAST(count(*) AS BIGINT) AS n_nearby_clicks
      |FROM errors e JOIN clicks c ON e.bin = c.bin
      |WHERE abs(c.cs - e.es) <= 60
      |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin

  /** As-of join: for each purchase, the epoch of the same user's latest
    * signup at or before it (NULL if none) — a running windowed max over
    * the union, ordered by (ts, event_id) so both engines tie-break
    * identically.
    */
  def asofLatestPrior(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
    val w = Window.partitionBy("user_id").orderBy(col("es"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_signup_s",
        max(when(col("event_type") === "signup", col("es"))).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "last_signup_s")
      .orderBy("event_id")
  }

  val asofLatestPriorSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE event_type IN ('purchase', 'signup'))
      |SELECT event_id, user_id, last_signup_s FROM (
      |  SELECT event_id, user_id, event_type,
      |    max(CASE WHEN event_type = 'signup' THEN es END)
      |      OVER (PARTITION BY user_id ORDER BY es, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_s
      |  FROM ev)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** Shared fixture extraction for the native as-of query family:
    * registers the asof functions/strategy and returns (purchases,
    * signups) with the epoch-second time columns every variant joins on.
    */
  private def purchasesAndSignups(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    graft.functions.VecFunctions.register(s)
    graft.plans.GraftStrategies.register(s)
    val purchases = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("es"))
    val signups = Tables.events(s, d)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("s_uid"), unix_timestamp(col("ts")).as("s_es"))
    (purchases, signups)
  }

  /** The same "latest signup at or before each purchase" question as
    * [[asofLatestPrior]], answered by the NATIVE as-of join operator
    * (`asof_le` marker → `AsofJoinStrategy` → `AsofJoinExec`; see
    * `plans/AsofJoin.scala`). Semantics difference vs the window
    * composition, pinned by the oracle: `asof_le` is a pure
    * `rightTime <= leftTime` bound — a signup in the SAME epoch second as
    * the purchase matches regardless of event-id order, so the oracle is
    * the correlated `max(es) WHERE es <= es` form, not the union-window
    * form. Scale shape: each side shuffles once on user_id, sorts on
    * (user_id, es), and one forward merge pass emits exactly one row per
    * purchase — no union materialization, no running-max window buffer.
    */
  def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    val (purchases, signups) = purchasesAndSignups(s, d)
    purchases
      .join(signups, expr("user_id = s_uid AND asof_le(es, s_es)"), "left")
      .select(col("event_id"), col("user_id"), col("s_es").as("last_signup_s"))
      .orderBy("event_id")
  }

  val asofJoinNativeSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE event_type = 'purchase'),
      |s AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE event_type = 'signup')
      |SELECT p.event_id, p.user_id,
      |  (SELECT max(s.es) FROM s
      |   WHERE s.user_id = p.user_id AND s.es <= p.es) AS last_signup_s
      |FROM p ORDER BY p.event_id""".stripMargin

  /** A backward as-of engine: returns `left` LEFT-joined with, per left
    * row, the latest right row whose `rightTime <= leftTime` under equal
    * keys — exactly one output row per left row, right columns under
    * their original names, null-filled when no right row qualifies. The
    * bare native join ([[asofLe]]) and both skew guards ([[asofSaltedLe]]
    * / [[asofSaltedAutoLe]] with their policy parameters bound,
    * [[asofSlicedLe]] with its width bound) all satisfy this contract, so
    * the DIRECTION routings ([[asofForwardGe]], [[asofNearest]]) take the
    * engine as a parameter: any direction composes with any skew guard,
    * and `AsofJoinProps` pins every cell of that matrix against brute
    * force under random skew.
    */
  type AsofLeEngine =
    (DataFrame, DataFrame, Seq[String], Seq[String], String, String) => DataFrame

  /** The bare backward as-of join — the identity [[AsofLeEngine]]: one
    * `asof_le` conjunct over the equi-keys, planned by `AsofJoinStrategy`
    * into the native sort-merge (or size/hint-selected broadcast) exec.
    */
  val asofLe: AsofLeEngine = (left, right, leftKeys, rightKeys,
      leftTime, rightTime) => {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size)
    val cond = (leftKeys.zip(rightKeys).map { case (a, b) => s"`$a` = `$b`" } :+
      s"asof_le(`$leftTime`, `$rightTime`)").mkString(" AND ")
    left.join(right, expr(cond), "left")
  }

  /** Skew-safe salted pre-pass for the native as-of join — closes the one
    * documented scale caveat of `AsofJoinExec`: as a custom physical node
    * it sits outside AQE's skew-join splitting, so a hot probe-side key
    * (one user producing 50× the median events) lands on one task and
    * serializes the stage.
    *
    * Classic selective salting, adapted to as-of semantics. One map-side-
    * combinable count over the left keys finds the keys whose row count
    * crosses `hotThreshold`; hot LEFT rows spread across `buckets` salt
    * values (deterministic murmur3 of key + time — reproducible run to
    * run), hot RIGHT rows REPLICATE to every salt value (each salted
    * probe partition must still see the key's full right history for
    * "latest prior" to be exact — replication factor applies to hot keys
    * only). Cold keys keep salt 0: no replication, no extra fan-out. The
    * salt becomes one more equi-conjunct, so `AsofJoinStrategy` plans the
    * SAME native exec, now clustered on (key, salt).
    *
    * Scale ledger: + one aggregation over left keys (partial-agg
    * combined, output bounded by |left| / hotThreshold rows — the hot set
    * is small by construction, which is what makes broadcasting the tag
    * join safe); + |hot right rows| × buckets replication; − the stage's
    * straggler. Addresses probe-side (left) skew — the fact-stream case.
    * A key whose RIGHT side is hot is not helped (every salt bucket still
    * carries that key's full history); that calls for time-range
    * partitioning of the build side, a different operator.
    *
    * Left/right column names must be disjoint (same contract as the bare
    * `asof_le` join condition). Output = left columns then right columns,
    * salt dropped; row multiplicity identical to the unsalted native join
    * (spec-pinned, and `asof_join_salted` carries the same DuckDB oracle
    * as `asof_join_native`).
    */
  def asofSaltedLe(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      buckets: Int = 16, hotThreshold: Long = 100000L): DataFrame = {
    require(buckets > 0 && leftKeys.nonEmpty && leftKeys.size == rightKeys.size)
    // the scratch columns must not clobber caller columns — fail loudly
    // instead of silently dropping a same-named input column at the end
    val scratch = Set("__hot_n", "__sf", "__lsalt", "__rsalt")
    require((left.columns ++ right.columns).forall(c => !scratch.contains(c)),
      s"input columns may not use the reserved names ${scratch.mkString(", ")}")
    // bounded: ≤ |left| / hotThreshold rows by construction; every hot key
    // gets the same caller-fixed salt factor
    val hot = left.groupBy(leftKeys.map(col): _*).agg(count(lit(1)).as("__hot_n"))
      .filter(col("__hot_n") > hotThreshold)
      .select(leftKeys.map(col) :+ lit(buckets).cast("int").as("__sf"): _*)
    saltedTail(left, right, leftKeys, rightKeys, leftTime, rightTime,
      broadcast(hot))
  }

  /** The salting tail shared by every salted as-of form ([[asofSaltedLe]],
    * [[asofSaltedAutoLe]]): given a hot frame of (left key columns,
    * `__sf`: per-key salt factor ≥ 1), tag-join it to both sides, spread
    * hot LEFT rows across their key's `__sf` salt values (deterministic
    * murmur3 of key + time), REPLICATE hot RIGHT rows to every salt value
    * of their key, leave cold keys at salt 0, and join with the salt as
    * one more equi-conjunct so `AsofJoinStrategy` plans the same native
    * exec clustered on (key, salt). One implementation, so a fix here
    * (e.g. the round-9 column-order restore) reaches every form at once. */
  private def saltedTail(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String, hot: DataFrame): DataFrame = {
    val lSalted = left
      .join(hot, leftKeys, "left")
      .withColumn("__lsalt",
        when(col("__sf").isNotNull,
          pmod(hash(leftKeys.map(col) :+ col(leftTime): _*), col("__sf")))
          .otherwise(lit(0)))
      .drop("__sf")
    val rHot = hot.toDF(rightKeys :+ "__sf": _*)
    val rSalted = right
      .join(rHot, rightKeys, "left")
      .withColumn("__rsalt", explode(
        when(col("__sf").isNotNull, sequence(lit(0), col("__sf") - 1))
          .otherwise(array(lit(0)))))
      .drop("__sf")
    // backtick-quote caller names so dots/reserved words parse as plain
    // column references, never as struct access or syntax
    val cond = (leftKeys.zip(rightKeys).map { case (a, b) => s"`$a` = `$b`" } :+
      "__lsalt = __rsalt" :+ s"asof_le(`$leftTime`, `$rightTime`)").mkString(" AND ")
    // the using-column tag joins above moved the join keys to the front of
    // the left block; restore the caller's column order so positional
    // consumers see exactly what the bare asof_le join produces
    lSalted.join(rSalted, expr(cond), "left")
      .select((left.columns ++ right.columns).map(c => col(s"`$c`")): _*)
  }

  /** The `asof_join_native` question routed through [[asofSaltedLe]] with a
    * threshold low enough that the fixture's busiest users actually take
    * the salted branch — so the oracle pins the salted path's semantics
    * (identical to the unsalted native join), not just the cold-key
    * passthrough. Balance under engineered 50×-median skew is the
    * `AsofJoinSpec` salting test's job.
    */
  def asofJoinSalted(s: SparkSession, d: String): DataFrame = {
    val (purchases, signups) = purchasesAndSignups(s, d)
    asofSaltedLe(purchases, signups, Seq("user_id"), Seq("s_uid"),
        "es", "s_es", buckets = 4, hotThreshold = 8L)
      .select(col("event_id"), col("user_id"), col("s_es").as("last_signup_s"))
      .orderBy("event_id")
  }

  /** Diagnostic-DRIVEN salted as-of join: [[asofSaltedLe]] with the hot
    * set, and a per-key salt factor, derived from the data the way
    * `Skew.skewDiagnostic` derives them — per-key probe counts against
    * the median key's count — instead of caller-supplied constants. This
    * wires the detection pass into the mitigation it was built for: the
    * caller states a POLICY (`skewRatio`: how many × median counts as
    * hot; `maxFactor`: replication cap), not per-dataset tuning numbers.
    *
    * Differences from the manual form, each scale-motivated:
    *  - the hot set is `count > skewRatio × median(count)` — the
    *    diagnostic's rule — so the threshold tracks the data; the median
    *    runs as `percentile_approx` on the per-key COUNTS frame (one row
    *    per key; the approx form is the stated extreme-cardinality
    *    posture of the diagnostic, exercised here) and lands on the
    *    driver as a single scalar literal (one row by construction);
    *  - each hot key gets its OWN salt factor `ceil(count / median)`
    *    capped at `maxFactor` (the diagnostic's `salt_factor` column),
    *    so a 50×-median key fans out ~50 ways while a 5×-median key
    *    replicates its history only 5× — per-key-proportional balance
    *    the one-global-bucket-count form cannot give without paying the
    *    hottest key's replication on every hot key;
    *  - the hot set is bounded ABSOLUTELY by `maxHotKeys` (hottest
    *    first, deterministic key tiebreak). The relative rule alone does
    *    not bound it: on a long-tail corpus where the median key count
    *    is 1, EVERY key appearing more than `skewRatio` times is "hot",
    *    up to |left|/skewRatio keys. Keys beyond the top-`maxHotKeys`
    *    stay unsalted — correct (salting any subset of keys is exact)
    *    and by construction colder than every key that was salted. The
    *    bound is what makes the collected hot set a sanctioned
    *    driver-side artifact (≤ maxHotKeys small rows, the codebook
    *    pattern), served back as one broadcast local relation so the
    *    per-key counts aggregation executes exactly twice (median pass +
    *    hot-set pass) — the manual form's two-pass ledger — instead of
    *    once per tag join.
    *
    * Same exactness argument as [[asofSaltedLe]]: the salt is derived
    * from left columns only, hot right histories are replicated into
    * every salt bucket of their key, so "latest prior" is exact;
    * `asof_join_salted_auto` carries `asof_join_native`'s DuckDB oracle
    * and `AsofSaltedSpec` pins balance parity with the manual
    * configuration on the engineered 50×-median fixture. Output columns:
    * left then right, caller order. Note the hot-set derivation runs two
    * Spark jobs at CALL time (eager, like the diagnostic it embeds).
    */
  def asofSaltedAutoLe(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      skewRatio: Double = 4.0, maxFactor: Int = 64,
      maxHotKeys: Int = 10000): DataFrame = {
    require(skewRatio >= 1.0 && maxFactor > 0 && maxHotKeys > 0 &&
      leftKeys.nonEmpty && leftKeys.size == rightKeys.size)
    val scratch = Set("__n", "__sf", "__lsalt", "__rsalt")
    require((left.columns ++ right.columns).forall(c => !scratch.contains(c)),
      s"input columns may not use the reserved names ${scratch.mkString(", ")}")
    val counts = left.groupBy(leftKeys.map(col): _*).agg(count(lit(1)).as("__n"))
    val medRow = counts.agg(
      expr("percentile_approx(CAST(__n AS DOUBLE), 0.5, 10000)")).first()
    // empty left → null percentile → empty hot set either way; counts are
    // ≥ 1 per key so a real median is ≥ 1
    val med = if (medRow.isNullAt(0)) 1.0 else medRow.getDouble(0).max(1.0)
    val hotDF = counts
      .filter(col("__n") > lit(med * skewRatio))
      .orderBy(col("__n").desc +: leftKeys.map(col): _*)
      .limit(maxHotKeys)
      .select(leftKeys.map(col) :+
        least(ceil(col("__n") / lit(med)), lit(maxFactor.toLong))
          .cast("int").as("__sf"): _*)
    val hotRows = hotDF.collect() // bounded: ≤ maxHotKeys rows
    val hot = left.sparkSession.createDataFrame(
      java.util.Arrays.asList(hotRows: _*), hotDF.schema)
    saltedTail(left, right, leftKeys, rightKeys, leftTime, rightTime,
      broadcast(hot))
  }

  /** The `asof_join_native` question through [[asofSaltedAutoLe]] with a
    * skew ratio low enough that the fixture's busiest users are detected
    * as hot BY THE DIAGNOSTIC RULE (no per-dataset constants) — so the
    * oracle pins the auto-derived path's semantics end to end.
    */
  def asofJoinSaltedAuto(s: SparkSession, d: String): DataFrame = {
    val (purchases, signups) = purchasesAndSignups(s, d)
    asofSaltedAutoLe(purchases, signups, Seq("user_id"), Seq("s_uid"),
        "es", "s_es", skewRatio = 1.5, maxFactor = 8)
      .select(col("event_id"), col("user_id"), col("s_es").as("last_signup_s"))
      .orderBy("event_id")
  }

  /** Time-sliced as-of join — the BUILD-side skew guard [[asofSaltedLe]]
    * deliberately leaves out (its scaladoc names this operator): a key
    * whose RIGHT side is hot (one instrument carrying 50× the median
    * quote history) sorts its whole history on one task under the plain
    * native exec, and salting cannot help — every salt bucket would need
    * the full history replicated anyway. Slicing the TIME axis fixes it
    * without replication:
    *
    *  1. every row (both sides) gets its floor(time / sliceWidth) bucket,
    *     and the bucket joins the equi-key list — the native exec now
    *     clusters on (key, bucket), so a hot key's history splits across
    *     its time range;
    *  2. "latest prior" may live in an EARLIER bucket, so each (key,
    *     bucket) cluster is seeded with ONE carry-in row: the key's
    *     latest right row from any strictly-earlier bucket. The carry
    *     table is built on the per-(key, bucket) SUMMARY relation
    *     (max_by row per bucket — |distinct key×bucket| rows, not
    *     |right| rows) with one running-window pass per key, then
    *     re-targeted at the LEFT side's buckets so empty-gap buckets are
    *     covered too.
    *
    * Inside a cluster the merge picks the latest in-bucket row ≤ lt when
    * one exists, else the carry row (whose time < bucket start ≤ lt by
    * construction) — exactly the plain as-of answer, spec- and
    * property-pinned, and `asof_join_sliced` shares `asof_join_native`'s
    * DuckDB oracle. Scale ledger: + one summary aggregate over the right
    * side (map-side combinable), + one small window over key×bucket
    * rows, + |left buckets with a prior| carry rows unioned into the
    * build side; − the hot key's single-task sort. Null semantics are
    * inherited: null times bucket to null and match nothing; null keys
    * take the exec's outer-null path. Tie payloads among equal times
    * remain unspecified (the exec's documented contract).
    */
  def asofSlicedLe(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      sliceWidth: Long): DataFrame = {
    require(sliceWidth > 0 && leftKeys.nonEmpty && leftKeys.size == rightKeys.size)
    val scratch = Set("__lbucket", "__rbucket", "__srow", "__isr", "__carry")
    require((left.columns ++ right.columns).forall(c => !scratch.contains(c)),
      s"input columns may not use the reserved names ${scratch.mkString(", ")}")
    // exact floor division for any sign: (t - pmod(t, W)) is the greatest
    // multiple of W <= t (pmod is non-negative), and integral `div` of an
    // exact multiple divides exactly for ALL longs — `/` on long columns
    // is DOUBLE division, exact only up to 2^53. Domain limit: the
    // subtraction wraps for t < Long.MinValue + W (epoch-second times are
    // nowhere near), which would break the monotone-bucketing invariant
    // the carry-in pass depends on.
    def bucketOf(t: Column): Column =
      call_function("div", t - pmod(t, lit(sliceWidth)), lit(sliceWidth))
    val rCols = right.columns
    // right rows that can never match (null key/time) are dropped up
    // front: the exec would skip them anyway, and the summary pass must
    // not see null buckets
    val rB = right
      .filter(col(rightTime).isNotNull &&
        rightKeys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__rbucket", bucketOf(col(rightTime)).cast("long"))
    // per-(key, bucket) latest right row — the summary the carry pass runs
    // on; max_by resolves equal-time ties arbitrarily, matching the exec's
    // unspecified-tie contract
    val summary = rB.groupBy(rightKeys.map(col) :+ col("__rbucket"): _*)
      .agg(max_by(struct(rCols.map(col): _*), col(rightTime)).as("__srow"))
    // carry row per LEFT bucket: the latest summary row from any strictly
    // earlier bucket. Left buckets (isr=0) sort before same-bucket summary
    // rows (isr=1), so the running last() sees only earlier buckets.
    val lBuckets = left
      .filter(col(leftTime).isNotNull &&
        leftKeys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__rbucket", bucketOf(col(leftTime)).cast("long"))
      .select(leftKeys.map(col) :+ col("__rbucket"): _*)
      .distinct()
    val keyedUnion = summary
      .select(rightKeys.map(col) :+ col("__rbucket") :+ col("__srow") :+
        lit(1).as("__isr"): _*)
      .unionByName(lBuckets.toDF(rightKeys :+ "__rbucket": _*)
        .select(rightKeys.map(col) :+ col("__rbucket") :+
          lit(null).cast(summary.schema("__srow").dataType).as("__srow") :+
          lit(0).as("__isr"): _*))
    val w = Window.partitionBy(rightKeys.map(col): _*)
      .orderBy(col("__rbucket"), col("__isr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = keyedUnion
      .withColumn("__carry", last(col("__srow"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0 && col("__carry").isNotNull)
      .select(col("__rbucket") +: rCols.map(c => col(s"__carry.$c").as(c)): _*)
      .select(rCols.map(col) :+ col("__rbucket"): _*)
    val rUnion = rB.select(rCols.map(col) :+ col("__rbucket"): _*)
      .unionByName(carry)
    val lSliced = left.withColumn("__lbucket", bucketOf(col(leftTime)).cast("long"))
    val cond = (leftKeys.zip(rightKeys).map { case (a, b) => s"`$a` = `$b`" } :+
      "__lbucket = __rbucket" :+ s"asof_le(`$leftTime`, `$rightTime`)").mkString(" AND ")
    lSliced.join(rUnion, expr(cond), "left").drop("__lbucket", "__rbucket")
  }

  /** The `asof_join_native` question through [[asofSlicedLe]] with a slice
    * width that puts the fixture's busiest users across several buckets —
    * so the oracle pins the carry-in semantics (an earlier-bucket signup
    * must still be found), not just the single-bucket degenerate case.
    */
  def asofJoinSliced(s: SparkSession, d: String): DataFrame = {
    val (purchases, signups) = purchasesAndSignups(s, d)
    asofSlicedLe(purchases, signups, Seq("user_id"), Seq("s_uid"),
        "es", "s_es", sliceWidth = 7L * 86400L)
      .select(col("event_id"), col("user_id"), col("s_es").as("last_signup_s"))
      .orderBy("event_id")
  }

  /** Staleness-bounded as-of join — the feature-store point-in-time
    * contract: enrich each left row with the latest prior right row ONLY
    * if that row is no older than `maxStaleness` time units; a staler
    * match is as good as none (a 3-week-old quote must not price today's
    * trade). The key insight that keeps this free: the latest prior is
    * also the CLOSEST prior, so if IT exceeds the bound every other
    * candidate does too — the bound is exact as a post-projection over
    * the unchanged native as-of join. Zero extra shuffles, zero extra
    * scans, stays inside whole-stage codegen; the projection is exposed
    * as [[withStalenessBound]] so it composes with the skew guards —
    * `AsofJoinProps` pins the salted and sliced compositions against the
    * filtered brute-force reference.
    *
    * Time columns must be numeric (epoch seconds in every graft query) so
    * the staleness subtraction is a plain long difference. Unmatched and
    * out-of-tolerance left rows are indistinguishable in the output (all
    * right columns null) — exactly the semantics a training-data join
    * wants.
    */
  def asofToleranceLe(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      maxStaleness: Long): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size)
    val cond = (leftKeys.zip(rightKeys).map { case (a, b) => s"`$a` = `$b`" } :+
      s"asof_le(`$leftTime`, `$rightTime`)").mkString(" AND ")
    withStalenessBound(left.join(right, expr(cond), "left"),
      right.columns, leftTime, rightTime, maxStaleness)
  }

  /** The match-bound post-projection in its general form: null every
    * column in `rightCols` on rows where `keep` is not true. The exactness
    * argument is each direction's closest-match property — the match an
    * as-of variant returns is the closest qualifying row in its
    * direction, so if IT violates a distance bound every other candidate
    * does too, and the bound is exact as a projection. Composes with ANY
    * variant producing matches under the original right column names
    * ([[asofSaltedLe]] / [[asofSlicedLe]] included — `AsofJoinProps` pins
    * those compositions).
    */
  def withMatchBound(joined: DataFrame, rightCols: Seq[String],
      keep: Column): DataFrame = {
    val scratch = "__within"
    require(!joined.columns.contains(scratch),
      s"input columns may not use the reserved name $scratch")
    // the flag is materialized BEFORE the right columns are nulled so the
    // per-column projection below can't see its own overwrites
    val j = joined.withColumn(scratch, keep)
    rightCols.foldLeft(j) { (df, c) =>
      df.withColumn(c, when(col(scratch), col(c)))
    }.drop(scratch)
  }

  /** Backward-direction staleness bound ([[withMatchBound]] instance):
    * the pandas `merge_asof(tolerance=...)` contract for the latest-prior
    * direction. The forward twin bounds `rightTime − leftTime`, the
    * nearest twin bounds `abs(rightTime − leftTime)` — all three pinned
    * by `AsofJoinProps` tolerance properties.
    */
  def withStalenessBound(joined: DataFrame, rightCols: Seq[String],
      leftTime: String, rightTime: String, maxStaleness: Long): DataFrame = {
    require(maxStaleness >= 0)
    withMatchBound(joined, rightCols,
      col(rightTime).isNotNull &&
        col(leftTime) - col(rightTime) <= lit(maxStaleness))
  }

  /** The native as-of question with a two-day staleness bound — chosen
    * against the fixture's measured gap distribution (median purchase→
    * signup gap ≈ 1.4 days, p90 ≈ 4.6 days), so the bound genuinely
    * splits the population: both the kept and the nulled branches carry
    * real rows at every sf, and the oracle pins the boundary semantics
    * (gap == bound is kept, gap == bound+1 is nulled).
    */
  def asofJoinTolerance(s: SparkSession, d: String): DataFrame = {
    val (purchases, signups) = purchasesAndSignups(s, d)
    asofToleranceLe(purchases, signups, Seq("user_id"), Seq("s_uid"),
        "es", "s_es", maxStaleness = 2L * 86400L)
      .select(col("event_id"), col("user_id"), col("s_es").as("last_signup_s"))
      .orderBy("event_id")
  }

  val asofJoinToleranceSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE event_type = 'purchase'),
      |s AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE event_type = 'signup')
      |SELECT p.event_id, p.user_id,
      |  (SELECT max(s.es) FROM s
      |   WHERE s.user_id = p.user_id AND s.es <= p.es
      |     AND p.es - s.es <= 172800) AS last_signup_s
      |FROM p ORDER BY p.event_id""".stripMargin

  /** Forward as-of join — the mirror of `asof_le`: per left row, the
    * EARLIEST right row with `rightTime >= leftTime` (the "next quote"
    * direction of pandas `merge_asof(direction='forward')`). No new exec:
    * min(rt) subject to rt ≥ lt is exactly max(−rt) subject to −rt ≤ −lt,
    * so negating both time columns routes the question through the
    * unchanged backward machinery — same one-shuffle-per-side,
    * one-merge-pass plan, same null semantics (a null time negates to
    * null and matches nothing). The backward machinery is the `engine`
    * parameter (default: the bare native join), so every skew guard
    * composes mechanically: pass [[asofSaltedLe]] / [[asofSlicedLe]] with
    * their policy parameters bound and the guard runs on the negated
    * times — `AsofJoinProps` pins each composition against brute force
    * under random skew. Time columns must be numeric (epoch seconds in
    * every graft query); negation has no meaning for TimestampType.
    * Domain limit: `-Long.MinValue` wraps to itself under non-ANSI long
    * arithmetic, so a time of exactly `Long.MinValue` would mis-join
    * silently — epoch-second data is 10 orders of magnitude away, but a
    * caller feeding sentinel extremes must screen them first (same caveat
    * for [[asofNearest]]'s forward pass).
    */
  def asofForwardGe(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      engine: AsofLeEngine = asofLe): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size)
    val scratch = Set("__lneg", "__rneg")
    require((left.columns ++ right.columns).forall(c => !scratch.contains(c)),
      s"input columns may not use the reserved names ${scratch.mkString(", ")}")
    val l2 = left.withColumn("__lneg", -col(leftTime))
    val r2 = right.withColumn("__rneg", -col(rightTime))
    engine(l2, r2, leftKeys, rightKeys, "__lneg", "__rneg")
      .drop("__lneg", "__rneg")
  }

  /** Nearest as-of join — per left row, the right row minimizing
    * `|rightTime − leftTime|`, ties broken toward the PRIOR row (pandas
    * `merge_asof(direction='nearest')`). Composed as a two-pass pipeline
    * over the native exec: the backward pass ([[asofJoinNative]]'s shape)
    * widens each left row with its latest-prior match, the forward pass
    * ([[asofForwardGe]]) widens it again with its earliest-next match,
    * and one codegen'd projection keeps whichever side is closer. Both
    * passes preserve left-row multiplicity (exactly one output row per
    * left row is the exec's contract), so no row-id bookkeeping is
    * needed — the pipeline is two key-shuffles and a projection, nothing
    * else. Right columns come back under their original names, taken
    * from the winning side (all null when neither side matched). Both
    * passes run on the `engine` parameter (default: the bare native
    * join), so the skew guards compose here exactly as in
    * [[asofForwardGe]] — `AsofJoinProps` pins nearest × salted and
    * nearest × sliced against brute force under random skew.
    */
  def asofNearest(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      engine: AsofLeEngine = asofLe): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size)
    // the restore-to-original-names projection at the end would silently
    // OVERWRITE a left column sharing a right column's name (the bare
    // asof_le join fails loudly on the same input) — refuse up front
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left/right column names must be disjoint (shared: ${shared.mkString(", ")})")
    val scratch = right.columns.flatMap(c => Seq(s"__p_$c", s"__n_$c")).toSet ++
      Set("__lneg", "__rneg")
    require((left.columns ++ right.columns).forall(c => !scratch.contains(c)),
      s"input columns may not use the reserved names ${scratch.mkString(", ")}")
    val pRight = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"__p_$c"))
    val afterPrior = engine(left, pRight,
      leftKeys, rightKeys.map(b => s"__p_$b"), leftTime, s"__p_$rightTime")
    val nRight = right.columns.foldLeft(right)((d, c) =>
        d.withColumnRenamed(c, s"__n_$c"))
      .withColumn("__rneg", -col(s"__n_$rightTime"))
    val both = engine(afterPrior.withColumn("__lneg", -col(leftTime)), nRight,
        leftKeys, rightKeys.map(b => s"__n_$b"), "__lneg", "__rneg")
      .drop("__lneg", "__rneg")
    val pT = col(s"__p_$rightTime")
    val nT = col(s"__n_$rightTime")
    // tie (equal distance, including an exact rt == lt hit found by both
    // passes) goes to the prior side; a missing side loses automatically
    val usePrior = pT.isNotNull &&
      (nT.isNull || col(leftTime) - pT <= nT - col(leftTime))
    right.columns.foldLeft(both) { (d, c) =>
      d.withColumn(c, when(usePrior, col(s"__p_$c")).otherwise(col(s"__n_$c")))
    }.drop(right.columns.flatMap(c => Seq(s"__p_$c", s"__n_$c")): _*)
  }

  /** The native as-of question in the forward direction: for each
    * purchase, the epoch of the same user's EARLIEST signup at or after
    * it. Exercises the negation routing end-to-end against a min()
    * oracle.
    */
  def asofJoinForward(s: SparkSession, d: String): DataFrame = {
    val (purchases, signups) = purchasesAndSignups(s, d)
    asofForwardGe(purchases, signups, Seq("user_id"), Seq("s_uid"), "es", "s_es")
      .select(col("event_id"), col("user_id"), col("s_es").as("next_signup_s"))
      .orderBy("event_id")
  }

  val asofJoinForwardSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE event_type = 'purchase'),
      |s AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE event_type = 'signup')
      |SELECT p.event_id, p.user_id,
      |  (SELECT min(s.es) FROM s
      |   WHERE s.user_id = p.user_id AND s.es >= p.es) AS next_signup_s
      |FROM p ORDER BY p.event_id""".stripMargin

  /** The nearest-signup question: both directions genuinely win rows on
    * the fixture (a purchase early in a user's history sits closer to the
    * NEXT signup than to any prior one), so the oracle pins the
    * choose-the-closer projection and the prior-wins tie rule, not just
    * one direction's passthrough.
    */
  def asofJoinNearest(s: SparkSession, d: String): DataFrame = {
    val (purchases, signups) = purchasesAndSignups(s, d)
    asofNearest(purchases, signups, Seq("user_id"), Seq("s_uid"), "es", "s_es")
      .select(col("event_id"), col("user_id"), col("s_es").as("nearest_signup_s"))
      .orderBy("event_id")
  }

  val asofJoinNearestSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE event_type = 'purchase'),
      |s AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |  FROM events WHERE event_type = 'signup'),
      |b AS (
      |  SELECT p.event_id, p.user_id, p.es,
      |    (SELECT max(s.es) FROM s
      |     WHERE s.user_id = p.user_id AND s.es <= p.es) AS pb,
      |    (SELECT min(s.es) FROM s
      |     WHERE s.user_id = p.user_id AND s.es >= p.es) AS nf
      |  FROM p)
      |SELECT event_id, user_id,
      |  CASE WHEN pb IS NOT NULL AND (nf IS NULL OR es - pb <= nf - es)
      |       THEN pb ELSE nf END AS nearest_signup_s
      |FROM b ORDER BY event_id""".stripMargin

  /** The forward question routed through the SALTED engine — the
    * direction × skew-guard composition made driver-visible: same oracle
    * as `asof_join_forward`, with the threshold low enough that the
    * fixture's busiest users actually take the hot branch ON THE NEGATED
    * time axis (the salt hashes `-es`). `AsofJoinProps` covers the full
    * {forward, nearest} × {salted, auto-salted, sliced} matrix under
    * random skew; this entry and `asof_join_nearest_sliced` pin one cell
    * each end-to-end against DuckDB.
    */
  def asofJoinForwardSalted(s: SparkSession, d: String): DataFrame = {
    val (purchases, signups) = purchasesAndSignups(s, d)
    asofForwardGe(purchases, signups, Seq("user_id"), Seq("s_uid"), "es", "s_es",
        engine = asofSaltedLe(_, _, _, _, _, _, buckets = 4, hotThreshold = 8L))
      .select(col("event_id"), col("user_id"), col("s_es").as("next_signup_s"))
      .orderBy("event_id")
  }

  /** The nearest question routed through the SLICED engine (both passes —
    * the backward pass buckets `es`, the forward pass buckets `-es`, and
    * each must find carry-ins across its own bucket boundaries). Same
    * oracle as `asof_join_nearest`.
    */
  def asofJoinNearestSliced(s: SparkSession, d: String): DataFrame = {
    val (purchases, signups) = purchasesAndSignups(s, d)
    asofNearest(purchases, signups, Seq("user_id"), Seq("s_uid"), "es", "s_es",
        engine = asofSlicedLe(_, _, _, _, _, _, sliceWidth = 7L * 86400L))
      .select(col("event_id"), col("user_id"), col("s_es").as("nearest_signup_s"))
      .orderBy("event_id")
  }

  /** Interval width (seconds) for the overlap join below — one hour, wide
    * enough that the sparse fixture event stream produces a meaningful
    * overlap population at every sf. */
  val IntervalS = 3600L

  /** Interval-overlap join (range × range — distinct from the point-probes-
    * range shape of [[rangeJoinBinned]]): each view/purchase event spawns a
    * [ts, ts + IntervalS] activity interval; count, per user, the (view,
    * purchase) interval pairs that overlap. A naive theta join on the
    * overlap predicate is a nested loop; binning the time axis at the
    * interval width turns it into an equi-join on (user_id, bin) — each
    * width-W interval covers exactly two W-bins, so the join fan-out is
    * bounded and shuffles by key, scaling linearly.
    *
    * A pair can collide in both of its shared bins; instead of a post-join
    * DISTINCT, a pair is kept only in the bin its overlap STARTS in
    * (`floor(max(start_a, start_b) / W)`), which is unique per true pair —
    * the same emit-once trick as SimHash's first-agreeing-chunk. The
    * DuckDB oracle deliberately uses the NAIVE quadratic formulation, so
    * the binned plan is validated against straight overlap semantics, not
    * against its own binning.
    */
  def intervalOverlapJoin(s: SparkSession, d: String): DataFrame = {
    val W = IntervalS
    def iv(t: String) = Tables.events(s, d)
      .filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ss"))
      .select(col("user_id"), col("event_id"), col("ss"), (col("ss") + W).as("ee"),
        explode(array(expr(s"ss div $W"), expr(s"ss div $W + 1"))).as("bin"))
    val views = iv("view").as("v")
    val purch = iv("purchase").as("p")
    views.join(purch,
        col("v.user_id") === col("p.user_id") && col("v.bin") === col("p.bin") &&
          col("v.ss") <= col("p.ee") && col("p.ss") <= col("v.ee") &&
          col("v.bin") === expr(s"greatest(v.ss, p.ss) div $W"))
      .groupBy(col("v.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_overlapping_pairs"))
      .orderBy("user_id")
  }

  val intervalOverlapJoinSql: String =
    s"""WITH iv AS (
       |  SELECT user_id, event_id, event_type,
       |         CAST(floor(epoch(ts)) AS BIGINT) AS ss,
       |         CAST(floor(epoch(ts)) AS BIGINT) + $IntervalS AS ee
       |  FROM events WHERE event_type IN ('view', 'purchase'))
       |SELECT v.user_id, CAST(count(*) AS BIGINT) AS n_overlapping_pairs
       |FROM iv v JOIN iv p
       |  ON v.user_id = p.user_id
       | AND v.event_type = 'view' AND p.event_type = 'purchase'
       | AND v.ss <= p.ee AND p.ss <= v.ee
       |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "range_join_binned" -> (rangeJoinBinned _),
    "asof_latest_prior" -> (asofLatestPrior _),
    "asof_join_native" -> (asofJoinNative _),
    "asof_join_salted" -> (asofJoinSalted _),
    "asof_join_salted_auto" -> (asofJoinSaltedAuto _),
    "asof_join_sliced" -> (asofJoinSliced _),
    "asof_join_tolerance" -> (asofJoinTolerance _),
    "asof_join_forward" -> (asofJoinForward _),
    "asof_join_forward_salted" -> (asofJoinForwardSalted _),
    "asof_join_nearest" -> (asofJoinNearest _),
    "asof_join_nearest_sliced" -> (asofJoinNearestSliced _),
    "interval_overlap_join" -> (intervalOverlapJoin _))

  def oracles: Map[String, String] = Map(
    "range_join_binned" -> rangeJoinBinnedSql,
    "asof_latest_prior" -> asofLatestPriorSql,
    "asof_join_native" -> asofJoinNativeSql,
    // the salted and sliced pre-passes must be value-identical to the
    // unsalted native join, so they carry the SAME oracle
    "asof_join_salted" -> asofJoinNativeSql,
    "asof_join_salted_auto" -> asofJoinNativeSql,
    "asof_join_sliced" -> asofJoinNativeSql,
    "asof_join_tolerance" -> asofJoinToleranceSql,
    "asof_join_forward" -> asofJoinForwardSql,
    // direction × skew-guard compositions must be value-identical to the
    // bare directions, so they carry the SAME oracles
    "asof_join_forward_salted" -> asofJoinForwardSql,
    "asof_join_nearest" -> asofJoinNearestSql,
    "asof_join_nearest_sliced" -> asofJoinNearestSql,
    "interval_overlap_join" -> intervalOverlapJoinSql)
}
