package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage bisection for the lm_perplexity plan (the GramDebug pattern):
  * times the per-row tf pass, the c2/c1 model aggregates, the V pass,
  * and the full query separately, so a regression attributes to a stage
  * instead of a guess.
  *
  * Usage: runMain graft.tools.LmDebug [sfDir] [reps]
  */
object LmDebug {
  private def timed(tag: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[lmdebug] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
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
    graft.Tables.tuneSession(spark)
    import graft.operators.Scoring
    import graft.functions.Portable
    for (_ <- 1 to reps) {
      val docs = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      timed("tokenize_only") {
        docs.select(size(Portable.tokens(col("text"))).as("n"))
          .agg(sum("n")).count()
      }
      timed("occurrences") { Scoring.bigramOccurrences(docs).count() }
      timed("c2_aggregate") {
        Scoring.bigramOccurrences(docs)
          .groupBy("bg").agg(sum("m").as("c2")).count()
      }
      timed("v_distinct") {
        docs.select(explode(array_distinct(Portable.tokens(col("text")))).as("t"))
          .agg(countDistinct("t")).count()
      }
      timed("full lm_perplexity") {
        Scoring.lmPerplexity(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
