package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: print the grow-serve recall counters and the codebook k at a
  * given corpus. Usage: runMain graft.tools.GrowServeDebug [sfDir] */
object GrowServeDebug {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = graft.operators.Similarity.annGrowServeFull(spark, d)
      .select("grown_hits", "stale_hits", "nq").limit(1).collect().head
    val k = graft.operators.Similarity.growServeCodebookSize(spark, d)
    val (g, s, n) = (r.getAs[Long]("grown_hits"), r.getAs[Long]("stale_hits"),
      r.getAs[Long]("nq"))
    println(s"[growservedebug] d=$d k=$k grown=$g stale=$s nq=$n " +
      f"recall=${g.toDouble / (3 * n)}%.4f " +
      f"floor=${graft.operators.Similarity.GrowRecallCoeff / math.sqrt(k)}%.4f")
    spark.stop()
  }
}
