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
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses by default (PARQUET_TYPE_ILLEGAL). Read nanos as a long
    * (`spark.sql.legacy.parquet.nanosAsLong`, runtime-settable SQLConf) and
    * convert to a microsecond TimestampType column; the fixture generator
    * emits microsecond-resolution values, so the ns→µs floor is lossless.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
