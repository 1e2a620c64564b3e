package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Central schema + source registry.
  *
  * The reference declares its one logical schema three times by hand (JSON
  * wire ↔ POJO ↔ BigQuery DDL — see `/root/reference/src/main/java/com/
  * jesseekung/beamtutorial/entity/InputMessage.java:8-30` and
  * `deployment/modules/infra/resource/bigquery/demo1.json`). Here every
  * schema is declared once as a `StructType` and reused by sources, sinks,
  * streaming parsers and tests (SURVEY.md §1.2).
  *
  * Scale posture: all readers are plain parquet scans, so Catalyst predicate
  * pushdown / column pruning / partition pruning apply unchanged on a real
  * cluster; nothing here assumes local mode.
  */
object Tables {

  /** Wire format of the reference's Pub/Sub messages:
    * `{"event_time": epoch_seconds, "user_id": int, "click": int}`
    * (reference `utils/message_publisher.py:98-104`).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("event_time", LongType),
    StructField("user_id", IntegerType),
    StructField("click", IntegerType)))

  /** `events.props` JSON payload: `{"k": int}` (TESTDATA/FIXTURES). */
  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** `InferFiltersFromGenerate` clones a generator's child expression into
    * an inferred `size(e) > 0` filter, which predicate pushdown then drags
    * below exchanges — so an expensive array expression (shingling, minhash
    * signatures, chunk transforms) is evaluated a second time, inside the
    * single-split fixture scan, on one core. Measured at sf0.1: 8 s of
    * redundant shingling on dedup_ngram_jaccard alone. The rule only ever
    * ADDS a pruning filter, so excluding it is semantics-preserving; the
    * row-pruning it provides (skipping empty arrays before a Generate) is
    * noise for this workload. Called explicitly by the operators that
    * explode expensive arrays (shingle sets, minhash bands, chunk
    * transforms, term explodes) — NOT hidden inside the table reader, so a
    * consumer session that merely reads fixtures keeps its optimizer
    * untouched. Idempotent; appends to any user-set exclusion list.
    */
  private val inferFiltersRule =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
  def tuneSession(spark: SparkSession): Unit = {
    val key = "spark.sql.optimizer.excludedRules"
    val cur = spark.conf.getOption(key).getOrElse("")
    if (!cur.split(",").map(_.trim).contains(inferFiltersRule))
      spark.conf.set(key,
        if (cur.isEmpty) inferFiltersRule else s"$cur,$inferFiltersRule")
  }

  /** Read one fixture table. `dir` is an sf directory such as
    * `/root/testdata/sf0.01`.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** `events.ts` arrives in whatever physical form the fixture generator
    * of the day used, so the reader adapts to the scanned type instead of
    * assuming one generation:
    *
    *  - parquet TIMESTAMP(NANOS) (rounds ≤8): Spark 4 refuses it by
    *    default (PARQUET_TYPE_ILLEGAL), so nanos are read as a long
    *    (`spark.sql.legacy.parquet.nanosAsLong`, runtime-settable SQLConf)
    *    and floored to a microsecond TimestampType — lossless, the
    *    generator emits µs-resolution values;
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 9+):
    *    Spark scans it as TIMESTAMP_NTZ; cast to TimestampType under the
    *    fixed UTC session zone — the same instants the nanos path
    *    produced, so every downstream query, window and oracle is
    *    unchanged;
    *  - TimestampType: already the canonical form.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every fixture table as a temp view so a SQL-first consumer
    * can drive the whole engine from `spark.sql(...)` — combined with the
    * `GraftExtensions`/`VecFunctions` function registrations this is the
    * complete pure-SQL surface (the DuckDB oracles in `SparkEntry.oracleSql`
    * are near-verbatim runnable this way). Views are lazy plans over the
    * parquet scans: pushdown/pruning behave exactly as the DataFrame path.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { name =>
      val df = if (name == "events") events(spark, dir) else table(spark, dir, name)
      df.createOrReplaceTempView(name)
    }

  /** Round-robin repartition to the session's default parallelism, placed
    * in front of CPU-bound per-row stages (hashing, JSON round-trips,
    * vector math) and O(n²) pair joins — in LOCAL mode only.
    *
    * Why: the local fixtures are single-row-group parquet files, so a scan
    * is ONE input split no matter how many cores exist — without this,
    * such stages run single-threaded. The shuffled payload is the narrow
    * projection feeding the stage (a few MB here). On a real cluster
    * reading 100 TB the scan already has thousands of input splits, so
    * the repartition is SKIPPED entirely (non-local master) — adding it
    * there would shuffle the whole corpus for nothing. The mode check is
    * free; deriving the actual partition count via df.rdd would force a
    * physical planning pass per call, so the cheap proxy is preferred.
    */
  def parallelize(spark: SparkSession, df: DataFrame): DataFrame =
    if (spark.sparkContext.isLocal)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df

  /** [[parallelize]] gated on the input's OPTIMIZER-ESTIMATED size — for
    * stages whose per-row work is light and LINEAR (one regex + hash
    * pass), where the exchange only pays for itself once the single
    * split is big enough to keep cores busy. Below the threshold the
    * repartition is pure overhead (measured: +40% warm on the sf0.1
    * fingerprint pass); above it the single-threaded scan dominates
    * (measured: 4× at the ×10 drill corpus). O(n²)-downstream consumers
    * must keep unconditional [[parallelize]]: their work amplifies any
    * input size, so the size of the INPUT is a bad proxy there.
    * `stats.sizeInBytes` on a parquet scan is file metadata (compressed
    * bytes) — one analysis pass, no data read. */
  def parallelizeIfLarge(spark: SparkSession, df: DataFrame,
      minBytes: Long = 4L << 20): DataFrame =
    if (spark.sparkContext.isLocal &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes > minBytes)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
}
