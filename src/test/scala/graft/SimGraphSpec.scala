package graft

import org.scalatest.funsuite.AnyFunSuite

/** Targeted semantics for the similarity-graph family (cluster_silhouette,
  * ann_mmr_topk, pagerank_sim_graph): invariants plus plain-Scala
  * brute-force recomputes, independent of both Spark and the DuckDB
  * oracle.
  */
class SimGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private lazy val vecs: Map[Long, (Int, Array[Double])] = {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
    rows.map { r =>
      r.getLong(0) -> ((r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    }.toMap
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.indices.map(i => a(i) * b(i)).sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }
  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("silhouette: bounds hold, docs conserved, matches brute force") {
    val rows = operators.Similarity.clusterSilhouette(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == vecs.size)
    rows.foreach { r =>
      val s = r.getAs[Double]("avg_sil")
      assert(s >= -1.0 && s <= 1.0)
    }
    // brute force: centroid-based silhouette per label
    val byLabel = vecs.values.groupBy(_._1)
    val cents = byLabel.map { case (l, vs) =>
      val dim = vs.head._2.length
      val c = Array.tabulate(dim)(i => vs.map(_._2(i)).sum / vs.size)
      l -> c
    }
    def dist(a: Array[Double], c: Array[Double]): Double =
      math.sqrt(a.indices.map(i => (a(i) - c(i)) * (a(i) - c(i))).sum)
    val silByLabel = vecs.values.toSeq.map { case (l, v) =>
      val a = dist(v, cents(l))
      val b = cents.filter(_._1 != l).map(c => dist(v, c._2)).min
      (l, if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0)
    }.groupBy(_._1).map { case (l, xs) =>
      l -> xs.map(_._2).sum / xs.size
    }
    rows.foreach { r =>
      val want = silByLabel(r.getAs[Int]("label"))
      // the query emits round(avg_sil, 4): allow half an ulp of that scale
      assert(math.abs(r.getAs[Double]("avg_sil") - want) < 6e-5,
        s"label ${r.getAs[Int]("label")}")
    }
  }

  test("mmr: 3 distinct picks per probe, pick 1 is the relevance argmax, " +
    "full selection matches a plain-Scala MMR recompute") {
    val rows = operators.Similarity.annMmrTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("pick"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("rel")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, picks) =>
      assert(picks.length == 3 && picks.map(_._3).distinct.length == 3)
      // brute-force MMR over the top-8 candidates, 4-dp-rounded sims
      val q = vecs(qid)._2
      val cands = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, (_, v)) => (id, round4(cos(q, v))) }
        .sortBy { case (id, c) => (-c, id) }.take(8)
      val relOf = cands.toMap
      var chosen = List.empty[Long]
      for (_ <- 1 to 3) {
        val best = cands.filterNot(c => chosen.contains(c._1)).map {
          case (id, rel) =>
            val pen = chosen.map(s =>
              round4(cos(vecs(id)._2, vecs(s)._2))) match {
              case Nil => 0.0
              case xs => xs.max
            }
            val score = if (chosen.isEmpty) rel else 0.7 * rel - 0.3 * pen
            (id, score)
        }.minBy { case (id, sc) => (-sc, id) }
        chosen = chosen :+ best._1
      }
      val got = picks.sortBy(_._2).map(_._3).toList
      assert(got == chosen, s"qid $qid: got $got want $chosen")
      picks.foreach { case (_, _, id, rel) => assert(rel == relOf(id)) }
    }
  }

  test("cosine histogram: bins partition the probe-anchored pairs, shares sum to ~10000 bp") {
    // the pair family is probe-anchored (lower id < 200, the semdedup
    // truth panel) — O(probes * n) at any scale; the brute force below
    // applies the identical restriction
    val rows = operators.Similarity.embeddingCosHistogram(spark, sf).collect()
    val nPairs = (for {
      a <- vecs.keys.toSeq; b <- vecs.keys.toSeq if a < b && a < 200
    } yield 1L).sum
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nPairs,
      "bins must partition every probe-anchored pair exactly once")
    rows.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(b >= 0 && b <= 19)
    }
    val bpSum = rows.map(_.getAs[Long]("share_bp")).sum
    assert(bpSum >= 10000 - rows.length && bpSum <= 10000,
      s"integer-floor shares must sum to within bins-count of 10000: $bpSum")
    // spot-check every bin against brute force
    val brute = (for {
      (a, (_, va)) <- vecs.toSeq; (b, (_, vb)) <- vecs.toSeq
      if a < b && a < 200
    } yield round4(cos(va, vb))).groupBy(c =>
      math.min(math.floor((c + 1.0) * 10.0).toLong, 19L))
      .map { case (bin, xs) => bin -> xs.size.toLong }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == brute(r.getAs[Long]("bin")),
        s"bin ${r.getAs[Long]("bin")}")
    }
  }

  test("pagerank: total rank mass is 1, matches a plain-Scala power iteration") {
    val rows = operators.Dedup.pagerankSimGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("out_deg"),
        r.getAs[Double]("pagerank")))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3,
      "undirected graph has no dangling mass: ranks must sum to 1")
    // brute force from the SAME pair set the operator consumed
    val pairs = operators.Dedup.dedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap(p => Seq(p, p.swap))
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.length }
    val n = deg.size.toDouble
    var rank = deg.map { case (k, _) => k -> (1.0 / n) }
    for (_ <- 1 to 3) {
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => rank(e._1) / deg(e._1)).sum
      }
      rank = deg.map { case (k, _) =>
        k -> (0.15 / n + 0.85 * inflow.getOrElse(k, 0.0))
      }
    }
    rows.foreach { case (id, od, pr) =>
      assert(od == deg(id).toLong)
      assert(math.abs(pr - rank(id)) < 1e-5, s"doc $id")
    }
  }
}
