package graft.tools

import org.apache.spark.sql.SparkSession

/** Print formatted physical plans for a comma-separated query list —
  * the `.explain` loop the build methodology prescribes after each
  * operator lands (evidence goes to PLANS.md).
  *
  * Usage: runMain graft.tools.PlanAudit <sfDir> <q1,q2,...>
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"==== $n ====")
      println(graft.SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
