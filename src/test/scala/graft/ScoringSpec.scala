package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Portable
import graft.operators.Scoring

/** Independent brute-force reimplementation of every [[Scoring]] operator
  * over the sf0.001 fixture (plain Scala collections, no Spark, no SQL) —
  * a THIRD computation of each answer next to the Spark query and its
  * DuckDB oracle. Tolerances are 1e-3 on 4-dp-rounded scores: far below
  * any meaningful score difference, far above double-summation-order
  * noise.
  */
class ScoringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private lazy val docs: Seq[(Long, Array[String], String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "), r.getString(2)))
      .toSeq

  test("lm_perplexity matches a brute-force bigram LM") {
    val allBigrams = docs.flatMap { case (_, w, _) =>
      w.sliding(2).filter(_.length == 2).map(a => s"${a(0)} ${a(1)}")
    }
    val c2 = allBigrams.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val c1 = c2.groupBy(_._1.split(" ")(0)).map { case (k, v) => (k, v.values.sum) }
    val vocab = docs.flatMap(_._2).distinct.size.toDouble
    val expected = docs.map { case (id, w, _) =>
      val bgs = w.sliding(2).filter(_.length == 2)
        .map(a => s"${a(0)} ${a(1)}").toSeq
      val terms = bgs.groupBy(identity).toSeq.map { case (bg, occ) =>
        val m = occ.size.toDouble
        val p = (c2(bg) + 0.5) / (c1(bg.split(" ")(0)) + 0.5 * vocab)
        (m, m * math.log(p))
      }
      val n = terms.map(_._1).sum
      (id, (bgs.size.toLong, terms.map(_._2).sum / n))
    }.toMap

    val got = Scoring.lmPerplexity(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val (nBg, avgLogp) = expected(r.getLong(0))
      assert(r.getLong(1) == nBg, s"n_bigrams for doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - avgLogp) < 1e-3,
        s"avg_logp for doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - math.exp(-avgLogp)) < 0.02 +
        0.01 * math.exp(-avgLogp), s"ppl for doc ${r.getLong(0)}")
      // perplexity is strictly positive and finite — a smoothed LM can
      // never assign probability 0 or 1 to a seen corpus
      assert(r.getDouble(3) > 0 && !r.getDouble(3).isInfinite)
    }
  }

  test("bm25_topk matches a brute-force Okapi BM25 ranking") {
    val terms = Scoring.Bm25Terms
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.length).sum / n
    val df = terms.map { t =>
      (t, docs.count { case (_, w, _) => w.contains(t) }.toDouble)
    }.toMap
    val scored = docs.flatMap { case (id, w, _) =>
      val contribs = terms.flatMap { t =>
        val tf = w.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) None
        else Some(math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * w.length / avgdl)))
      }
      if (contribs.isEmpty) None
      else Some((id, BigDecimal(contribs.sum).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble, contribs.size.toLong))
    }
    val expectedTop = scored.sortBy { case (id, s, _) => (-s, id) }.take(15)

    val got = Scoring.bm25Topk(spark, sf).collect()
    assert(got.length == expectedTop.length)
    got.zip(expectedTop).foreach { case (r, (id, s, nt)) =>
      assert(r.getLong(0) == id, "top-k membership/order")
      assert(math.abs(r.getDouble(1) - s) < 1e-3, s"bm25 for doc $id")
      assert(r.getLong(2) == nt, s"n_terms for doc $id")
    }
  }

  test("scoring plans: the corpus is tokenized once, statistics are aggregates") {
    // pins the PLANS.md plan-audit claims structurally: how many times each
    // query's optimized plan scans the documents table (everything else
    // must come from checkpointed aggregates of the one tokenize pass)
    def docScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation
                if h.location.rootPaths.mkString(",").contains("documents.parquet") => 1
            case _ => 0
          }
      }.sum
    // lm: scoring occurrence pass + V branch + doc_id totality join —
    // the r15 trade: the corpus-sized tf checkpoint is gone (only the
    // VOCABULARY-sized c2 aggregate is a checkpoint leaf), paid for by
    // one more scan of the documents table (scans are cheap and
    // column-pruned; materializing corpus-sized intermediates is not)
    assert(docScans(Scoring.lmPerplexity(spark, sf)) == 3)
    // bm25: the (n_docs, avgdl) stats branch only (tf is a checkpoint leaf)
    assert(docScans(Scoring.bm25Topk(spark, sf)) == 1)
    // dsir: zero — bucket statistics AND scoring both read the one
    // checkpointed (doc_id, bucket) frame
    assert(docScans(Scoring.importanceWeights(spark, sf)) == 0)
  }

  test("importance_weights matches a brute-force DSIR computation") {
    val B = 256
    val bucketOf = (tok: String) => Portable.hash28Jvm(tok) % B
    val allToks = docs.flatMap { case (_, w, lang) => w.map(t => (bucketOf(t), lang)) }
    val cRaw = allToks.groupBy(_._1).map { case (b, v) => (b, v.size.toDouble) }
    val cTgt = allToks.filter(_._2 == "en").groupBy(_._1)
      .map { case (b, v) => (b, v.size.toDouble) }
    val nRaw = allToks.size.toDouble
    val nTgt = allToks.count(_._2 == "en").toDouble
    val lr = (b: Long) =>
      math.log((cTgt.getOrElse(b, 0.0) + 1.0) / (nTgt + B)) -
        math.log((cRaw.getOrElse(b, 0.0) + 1.0) / (nRaw + B))
    val expected = docs.map { case (id, w, _) =>
      (id, (w.length.toLong, w.map(t => lr(bucketOf(t))).sum))
    }.toMap

    val got = Scoring.importanceWeights(spark, sf).collect()
    assert(got.length == docs.size)
    var kept = 0
    got.foreach { r =>
      val (nt, lw) = expected(r.getLong(0))
      assert(r.getLong(1) == nt, s"n_toks for doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - lw) < 1e-3,
        s"log_w for doc ${r.getLong(0)}")
      // keep is defined on the ROUNDED weight in the query contract
      val lwR = BigDecimal(lw).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getBoolean(3) == lwR > 0, s"keep for doc ${r.getLong(0)}")
      if (r.getBoolean(3)) kept += 1
    }
    // the en slice IS the target distribution, so at least the en-heavy
    // half of the corpus must be more target-like than corpus-like
    assert(kept > 0 && kept < docs.size,
      "keep must split the corpus, not degenerate to all/none")
  }
}
