package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: two passes. Pass 1 (cold) exercises each query once —
  * this pays parquet footer reads, codegen compilation and JIT, and its
  * total is reported as `cold_total`. Pass 2 is the headline `value` /
  * per-query numbers: steady-state execution time, which is what a
  * long-running job at real scale experiences (JIT and codegen amortize
  * within the first seconds of a 100 TB run, so cold numbers mostly
  * measure JVM warmup, not the engine).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A failed query is reported as -1 sec and listed in `failed` — never
    // silently folded into a normal-looking wall time.
    def pass(): (Map[String, Double], List[String]) = {
      val failed = List.newBuilder[String]
      val times = SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"bench: query $name FAILED: $e")
            failed += name
            false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
      (times, failed.result())
    }
    val (cold, coldFailed) = pass()
    val (warm, warmFailed) = pass()
    val qs = warm.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = (coldFailed ++ warmFailed).distinct.sorted
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (warm.nonEmpty) warm.values.filter(_ >= 0).sum else 0.0
    val coldTotal = if (cold.nonEmpty) cold.values.filter(_ >= 0).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"failed":$failedJson,"sf":"$sfDir"}""")
    if (failed.nonEmpty) System.err.println(s"bench: ${failed.size} queries failed: ${failed.mkString(", ")}")
    spark.stop()
  }
}
