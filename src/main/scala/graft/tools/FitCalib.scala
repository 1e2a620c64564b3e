package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off calibration probe for `Similarity.RetrainFitFlag`: prints the
  * raw stale/retrained codebook-fit ratios (`retrainFitFull`) at each
  * fixture SF so the flag threshold is pinned against measured margins,
  * not guessed.  Usage: runMain graft.tools.FitCalib [sfDir ...]
  */
object FitCalib {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- dirs) {
      val rows = graft.operators.Similarity.retrainFitFull(spark, d)
        .orderBy("cohort").collect()
      rows.foreach { r =>
        println(s"[fitcalib] $d cohort=${r.getAs[String]("cohort")} " +
          s"n=${r.getAs[Long]("n_arrivals")} gain=${r.getAs[Double]("gain")}")
      }
    }
    spark.stop()
  }
}
