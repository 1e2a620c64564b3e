package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Randomized embedding corpora through the trained-IVF verdict machinery.
  * The `ann_ivf_trained_topk` oracle rests on one PROVABLE claim —
  * truth-hits at nprobe = 2 are never below nprobe = 1 — and one
  * implementation invariant: the top-2 cell assignment's first cell is
  * exactly the argmax assignment (same literal centroids, same
  * tie-break), else the two serving paths would silently probe different
  * cells. Both are pinned here under random vectors, where fixture luck
  * cannot hide a tie-break divergence. The fixture-calibrated 0.25
  * recall floor is deliberately NOT asserted on random data (it is a
  * fixture contract, not a theorem).
  */
object AnnProps extends Properties("Ann") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private lazy val spark = SparkTestSession.spark
  private lazy val scratch =
    graft.operators.Scratch.tempParent("graft-ann-props").toString
  private val caseId = new java.util.concurrent.atomic.AtomicInteger(0)

  private val corpusGen: Gen[(Int, Long)] = for {
    n <- Gen.chooseNum(60, 140)
    seed <- Gen.chooseNum(0L, Long.MaxValue / 2)
  } yield (n, seed)

  /** Stage a deterministic pseudo-random embeddings table (64-dim floats
    * in [-0.35, 0.35), the fixture's component range). */
  private def stage(n: Int, seed: Long): String = {
    val s = spark
    import s.implicits._
    val dir = s"$scratch/case${caseId.incrementAndGet()}"
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      (i, Array.fill(64)((rnd.nextFloat() * 0.7f) - 0.35f).toSeq, (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  property("top-2 assignment's first cell equals the argmax assignment") =
    Prop.forAll(corpusGen) { case (n, seed) =>
      val dir = stage(n, seed)
      graft.functions.VecFunctions.register(spark)
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
          expr("vec_norm(embedding)").as("nrm"))
        .localCheckpoint()
      // the untrained first-k codebook — enough centroids for the claim
      val codebook = e.filter(col("vec_id") < 8)
        .orderBy("vec_id").collect()
        .map(r => (r.getAs[Long]("vec_id").toInt,
          r.getAs[Seq[Float]]("embedding").toArray)).toSeq
      val argmax = Similarity.assignCells(e, codebook)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val top2 = Similarity.assignCellsTop2(e, codebook)
        .select("vec_id", "cell1", "cell2").collect()
      val ok = top2.forall { r =>
        r.getInt(1) == argmax(r.getLong(0)) && r.getInt(2) != r.getInt(1)
      }
      Prop(ok) :| s"n=$n seed=$seed"
    }

  property("trained-IVF verdict: nprobe2_not_worse holds on random corpora") =
    Prop.forAll(corpusGen) { case (n, seed) =>
      val dir = stage(n, seed)
      val rows = Similarity.annIvfTrainedRecall(spark, dir).collect()
      // probes exist (vec_id % 100 == 0 → at least vec 0)
      val ok = rows.nonEmpty &&
        rows.forall(_.getAs[Boolean]("nprobe2_not_worse"))
      Prop(ok) :| s"n=$n seed=$seed rows=${rows.length}"
    }
}
