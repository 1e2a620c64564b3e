package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage bisection for the dedup_winnow plan (the GramDebug pattern):
  * fingerprint pass alone vs posting aggregation vs the full pair query,
  * so far-decade cost attributes to hashing CPU or exchange mass instead
  * of a guess.
  *
  * Usage: runMain graft.tools.WinnowDebug [sfDir] [reps]
  */
object WinnowDebug {
  private def timed(tag: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[winnowdebug] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    for (_ <- 1 to reps) {
      val docs = graft.Tables.parallelize(spark,
        graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      timed("scan_only") { docs.count() }
      timed("fingerprints") { Dedup.winnowFingerprints(docs).count() }
      timed("posting_lists") {
        Dedup.winnowFingerprints(docs)
          .groupBy("fp").agg(count(lit(1)).as("n")).count()
      }
      timed("full dedup_winnow") { Dedup.dedupWinnow(spark, sfDir).count() }
    }
    spark.stop()
  }
}
