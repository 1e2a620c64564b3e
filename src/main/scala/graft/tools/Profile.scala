package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Diagnostic: run one named query N times in a warm JVM and print per-run
  * wall time plus the formatted physical plan.
  *
  * Usage: runMain graft.tools.Profile <queryName> [sfDir] [reps] [--explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) scala.util.Try(args(2).toInt).getOrElse(3)
      else 3
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides for plan experiments: --conf key=value ...
    args.sliding(2).foreach {
      case Array("--conf", kv) if kv.contains("=") =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      case _ =>
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      if (i == 1 && args.contains("--explain-final"))
        // post-execution adaptive plan (shows runtime stage/exchange reuse)
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
