package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: three passes. Pass 1 (cold) exercises each query once —
  * this pays parquet footer reads, codegen compilation and JIT, and its
  * total is reported as `cold_total`. The headline `value` / per-query
  * numbers are the per-query MIN over passes 2 and 3: steady-state
  * execution time, which is what a long-running job at real scale
  * experiences (JIT and codegen amortize within the first seconds of a
  * 100 TB run), with the min taken because single-pass warm numbers
  * showed up to 2x run-to-run noise on a shared host.
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
    // steady state = per-query min over two warm passes: single-pass warm
    // numbers showed up to 2x run-to-run noise on the shared host, and the
    // min is the honest "what the engine costs once JIT and codegen have
    // settled" figure a long-running job sees
    val (warm1, warm1Failed) = pass()
    val (warm2, warm2Failed) = pass()
    // a pass-transient failure keeps the other pass's valid measurement
    // (the query is still listed in `failed`); -1 only when both failed
    val warm = warm1.map { case (k, v) =>
      val v2 = warm2.getOrElse(k, -1.0)
      k -> ((v >= 0, v2 >= 0) match {
        case (true, true) => math.min(v, v2)
        case (true, false) => v
        case (false, true) => v2
        case _ => -1.0
      })
    }
    val qs = warm.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = (coldFailed ++ warm1Failed ++ warm2Failed).distinct.sorted
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (warm.nonEmpty) warm.values.filter(_ >= 0).sum else 0.0
    val coldTotal = if (cold.nonEmpty) cold.values.filter(_ >= 0).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"failed":$failedJson,"sf":"$sfDir"}""")
    if (failed.nonEmpty) System.err.println(s"bench: ${failed.size} queries failed: ${failed.mkString(", ")}")
    spark.stop()
  }
}
