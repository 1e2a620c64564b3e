package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: a shuffle join with one pathologically hot key
  * is re-planned at runtime — the oversized partition is split into
  * multiple tasks (the SMJ reports itself a skew join) — with identical
  * results. This is the runtime half of the skew strategy; the compile-time
  * half (two-phase salted aggregation) is `skew_salted_count`.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed join partition at runtime, results unchanged") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so the synthetic skew (not 256 MB of it) triggers
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k facts, 90% on key 0; 1k-row dimension
      val fact = spark.range(0, 100000)
        .select(col("id"),
          when(col("id") % 10 < 9, 0L).otherwise(col("id") % 1000).as("k"))
      val dim = spark.range(0, 1000)
        .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, Seq("k")).groupBy("name").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getAs[Long]("n")).sum == 100000L)
      assert(rows.find(_.getAs[String]("name") == "d0").get.getAs[Long]("n") == 90000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the join skewed, got:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
