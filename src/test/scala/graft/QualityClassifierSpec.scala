package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Scoring, TextAnalysis}
import graft.streaming.Streams

/** Distilled quality classifier (`Scoring.qualityClassifier` /
  * `writeQualityClassifier` / `qcScoreFromModel` /
  * `Streams.streamQualityClassify`) — the gate-distillation surface.
  * Pinned here: (a) serving the training corpus from the persisted model
  * imitates the teacher gate at ≥ the oracle verdict's floor, predicts
  * both classes, and is total; (b) the distributed IRLS trainer agrees
  * with a from-scratch Scala Newton implementation — same features, same
  * standardization, same ridge — to ≥ 99% prediction agreement (double
  * summation order may differ in the last ulp, exact weight equality is
  * not the contract); (c) micro-batched streaming scoring replays to the
  * same rows as the batch serving path.
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("served model imitates the gate above the floor and agrees with a Scala Newton trainer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qc-model").toString
    try {
      Scoring.writeQualityClassifier(spark, sf, dir)
      val probes = Tables.documents(spark, sf).select("doc_id", "text")
      val served = Scoring.qcScoreFromModel(spark, dir, probes).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("qc_keep")).toMap
      assert(served.size == probes.count(), "serving must be total")

      val labels = TextAnalysis.gopherVerdicts(probes).select("doc_id", "keep")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
      val acc = labels.count { case (id, y) => served(id) == y }.toDouble / labels.size
      assert(acc >= 0.80, s"served accuracy $acc below the oracle verdict floor")
      assert(served.values.exists(identity) && served.values.exists(!_),
        "student must predict both classes")

      // from-scratch Newton trainer on the same features
      val feats = TextAnalysis.gopherVerdicts(probes)
        .select(col("doc_id"), col("n_tokens"), col("mwl_c"),
          col("diversity_bp"), col("dup2_bp"), col("keep"))
        .collect().map { r =>
          val x4 = Array(math.log(r.getAs[Long]("n_tokens") + 1.0),
            r.getAs[Long]("mwl_c") / 100.0,
            r.getAs[Long]("diversity_bp") / 10000.0,
            r.getAs[Long]("dup2_bp") / 10000.0)
          (r.getAs[Long]("doc_id"), x4 ++ x4.map(v => v * v),
            if (r.getAs[Boolean]("keep")) 1.0 else 0.0)
        }
      val d = 8; val n = feats.length
      val mu = Array.tabulate(d)(j => feats.map(_._2(j)).sum / n)
      val sd = Array.tabulate(d) { j =>
        val v = feats.map(f => math.pow(f._2(j) - mu(j), 2)).sum / n
        val s = math.sqrt(v); if (s > 0) s else 1.0
      }
      val z = feats.map { case (id, x, y) =>
        (id, 1.0 +: Array.tabulate(d)(j => (x(j) - mu(j)) / sd(j)), y) }
      var w = Array.fill(d + 1)(0.0)
      for (_ <- 0 until Scoring.QcIters) {
        val g = Array.fill(d + 1)(0.0)
        val h = Array.ofDim[Double](d + 1, d + 1)
        z.foreach { case (_, zi, y) =>
          val p = 1.0 / (1.0 + math.exp(-zi.zip(w).map { case (a, b) => a * b }.sum))
          for (i <- 0 to d) {
            g(i) += (p - y) * zi(i) / n
            for (j <- i to d) h(i)(j) += p * (1 - p) * zi(i) * zi(j) / n
          }
        }
        for (i <- 0 to d; j <- i to d) h(j)(i) = h(i)(j)
        for (i <- 0 to d) h(i)(i) += 1e-6
        // gaussian elimination
        val m = h.map(_.clone()); val b = g.clone()
        for (c <- 0 to d) {
          val piv = (c to d).maxBy(r => math.abs(m(r)(c)))
          val (tr, tb) = (m(piv), b(piv)); m(piv) = m(c); b(piv) = b(c)
          m(c) = tr; b(c) = tb
          for (r <- c + 1 to d) {
            val f = m(r)(c) / m(c)(c)
            for (cc <- c to d) m(r)(cc) -= f * m(c)(cc)
            b(r) -= f * b(c)
          }
        }
        val step = Array.fill(d + 1)(0.0)
        for (r <- d to 0 by -1) {
          var s0 = b(r)
          for (c <- r + 1 to d) s0 -= m(r)(c) * step(c)
          step(r) = s0 / m(r)(r)
        }
        w = w.zip(step).map { case (wi, si) => wi - si }
      }
      val brute = z.map { case (id, zi, _) =>
        id -> (1.0 / (1.0 + math.exp(-zi.zip(w).map { case (a, b) => a * b }.sum)) >= 0.5)
      }.toMap
      val agree = brute.count { case (id, p) => served(id) == p }.toDouble / brute.size
      assert(agree >= 0.99,
        s"engine vs Scala Newton prediction agreement $agree below 99%")
    } finally SparkTestSession.deleteRecursively(dir)
  }

  test("streaming quality classification: micro-batched docs equal the batch serving path") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-qc-stream").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-qc-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-qc-ckpt").toString
    try {
      Scoring.writeQualityClassifier(spark, sf, dir)
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val chunks = docs.grouped((docs.length + 2) / 3).toSeq
      val in = MemoryStream[(Long, String)]
      val q = Streams.streamQualityClassify(
        in.toDF().toDF("doc_id", "text"), spark, dir, outDir, ckpt)
      try {
        chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
        def key(r: org.apache.spark.sql.Row) =
          (r.getLong(0), r.getDouble(1), r.getBoolean(2))
        val streamed = spark.read.parquet(outDir)
          .select("doc_id", "qc_score", "qc_keep")
          .collect().map(key).toSet
        val batch = Scoring.qcScoreFromModel(spark, dir,
          Tables.documents(spark, sf).select("doc_id", "text"))
          .collect().map(key).toSet
        assert(streamed == batch,
          s"stream-only: ${(streamed -- batch).take(3)}; " +
            s"batch-only: ${(batch -- streamed).take(3)}")
      } finally { q.stop(); () }
    } finally
      Seq(dir, outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
  }
}
