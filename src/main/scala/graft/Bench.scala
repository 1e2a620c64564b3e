package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: four passes. Pass 1 (cold) exercises each query once —
  * this pays parquet footer reads, codegen compilation, JIT, and any
  * one-time index builds; its per-query times are emitted as
  * `queries_cold` and its total as `cold_total`. The headline `value` /
  * `queries` numbers are the per-query MIN over THREE warm passes:
  * steady-state execution time, which is what a long-running job at real
  * scale experiences (JIT and codegen amortize within the first seconds
  * of a 100 TB run). Min-of-3 — not min-of-2 — because two consecutive
  * driver artifacts showed a uniform ~1.3–1.5× drift across queries whose
  * code had not changed; a third sample makes a single slow pass unable
  * to move any query's reported number. The host's `/proc/loadavg` is
  * captured before and after the run (`loadavg_before` / `loadavg_after`)
  * so a loaded shared host is visible IN the artifact instead of being
  * re-litigated from per-query deltas a round later.
  */
object Bench {
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val loadBefore = loadavg()
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
    val warmPasses = Seq.fill(3)(pass())
    // a pass-transient failure keeps the other passes' valid measurements
    // (the query is still listed in `failed`); -1 only when all failed
    val warm = cold.keys.map { k =>
      val valid = warmPasses.flatMap(_._1.get(k)).filter(_ >= 0)
      k -> (if (valid.nonEmpty) valid.min else -1.0)
    }.toMap
    def timesJson(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val failed =
      (coldFailed ++ warmPasses.flatMap(_._2)).distinct.sorted
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = warm.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    val loadAfter = loadavg()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${timesJson(warm)},"queries_cold":${timesJson(cold)},"cold_total":$coldTotal,"warm_passes":3,"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","failed":$failedJson,"sf":"$sfDir"}""")
    if (failed.nonEmpty) System.err.println(s"bench: ${failed.size} queries failed: ${failed.mkString(", ")}")
    spark.stop()
  }
}
