package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off stage bisection for the ngram-jaccard slowdown investigation:
  * times each pipeline stage of `dedup_ngram_jaccard` separately.
  * Usage: runMain graft.tools.GramDebug [sfDir] [reps]
  */
object GramDebug {
  private def timed(tag: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[gramdebug] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
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
    for (_ <- 1 to reps) {
      timed("gramSetDF") { graft.operators.Dedup.gramSetCount(spark, sfDir) }
      timed("retainedGrams") { graft.operators.Dedup.retainedGramCount(spark, sfDir) }
      timed("gramPairCounts") { graft.operators.Dedup.gramCandidateCount(spark, sfDir) }
      timed("full query") {
        graft.operators.Dedup.dedupNgramJaccard(spark, sfDir).count() }
    }
    spark.stop()
  }
}
