package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter injection: when a shuffle join's build side is
  * selective, Catalyst plants a bloom filter built from it onto the probe
  * side's scan, so most non-matching fact rows die before the shuffle.
  * At 100 TB this is the difference between shuffling the whole fact table
  * and shuffling roughly the matching fraction.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("selective shuffle join gets a bloom filter on the probe side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixtures are far below the 10 GiB production threshold
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fresh plan per call — one builder so both runs compare the SAME query
      def mkJoin() = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .join(Tables.orders(spark, sf)
          .filter(col("o_totalprice") > 400000).select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      val joined = mkJoin()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") &&
        optimized.contains("might_contain"),
        s"expected a runtime bloom filter build + probe in:\n$optimized")
      // and the filtered plan returns exactly what the unfiltered one does
      val bloom = joined.collect()(0)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = mkJoin().collect()(0)
      assert(bloom.getAs[Long]("n") == plain.getAs[Long]("n") &&
        bloom.getAs[Double]("q") == plain.getAs[Double]("q") &&
        bloom.getAs[Long]("n") > 0,
        s"bloom=$bloom plain=$plain")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
