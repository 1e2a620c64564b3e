package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.Portable
import graft.operators.Scoring

/** Randomized corpora through the scoring family vs the same brute-force
  * references `ScoringSpec` runs on the fixed fixture — tiny vocabularies
  * force dense bigram/bucket collisions, single-token documents exercise
  * the no-bigram totality branch (NULL scores), and all-one-language
  * corpora exercise the degenerate target distribution. Each case stages
  * its corpus as a real parquet documents table so the operators run
  * their actual read path.
  */
object ScoringProps extends Properties("Scoring") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkTestSession.spark
  private lazy val scratch =
    graft.operators.Scratch.tempParent("graft-scoring-props").toString
  private val caseId = new java.util.concurrent.atomic.AtomicInteger(0)

  // vocab overlaps Bm25Terms so retrieval matches occur
  private val vocab = Vector("join", "vector", "stream", "alpha", "beta", "gamma")
  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 18) // 1-token docs exercise the NULL branch
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private val corpusGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.chooseNum(4, 25)
    texts <- Gen.listOfN(n, docGen)
    langs <- Gen.listOfN(n, Gen.oneOf("en", "en", "fr")) // en-heavy, may degenerate
  } yield texts.zip(langs).zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }

  /** Stage a corpus as `<dir>/documents.parquet` with the fixture schema. */
  private def stage(corpus: List[(Long, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = s"$scratch/case${caseId.incrementAndGet()}"
    corpus.map { case (id, t, l) => (id, t, l, "srcP", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  property("lm_perplexity equals the brute-force bigram LM on random corpora") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      val docs = corpus.map { case (id, t, _) => (id, t.split(" ")) }
      val bgs = docs.flatMap(_._2.sliding(2).filter(_.length == 2)
        .map(a => s"${a(0)} ${a(1)}"))
      val c2 = bgs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val c1 = c2.groupBy(_._1.split(" ")(0)).map { case (k, v) => (k, v.values.sum) }
      val vsz = docs.flatMap(_._2).distinct.size.toDouble
      val expected = docs.map { case (id, w) =>
        val db = w.sliding(2).filter(_.length == 2).map(a => s"${a(0)} ${a(1)}").toSeq
        if (db.isEmpty) id -> None
        else {
          val terms = db.groupBy(identity).toSeq.map { case (bg, occ) =>
            (occ.size.toDouble, occ.size *
              math.log((c2(bg) + 0.5) / (c1(bg.split(" ")(0)) + 0.5 * vsz)))
          }
          id -> Some((db.size.toLong, terms.map(_._2).sum / terms.map(_._1).sum))
        }
      }.toMap
      val got = Scoring.lmPerplexity(spark, dir).collect()
      val ok = got.length == corpus.length && got.forall { r =>
        expected(r.getLong(0)) match {
          case None => r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)
          case Some((nBg, avg)) =>
            r.getLong(1) == nBg && math.abs(r.getDouble(2) - avg) < 1e-3
        }
      }
      Prop(ok) :| s"corpus=${corpus.take(3)}..."
    }

  property("bm25_topk equals the brute-force ranking on random corpora") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      val docs = corpus.map { case (id, t, _) => (id, t.split(" ")) }
      val n = docs.size.toDouble
      val avgdl = docs.map(_._2.length).sum / n
      val terms = Scoring.Bm25Terms
      val df = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
      val scored = docs.flatMap { case (id, w) =>
        val cs = terms.flatMap { t =>
          val tf = w.count(_ == t).toDouble
          if (tf == 0 || df(t) == 0) None
          else Some(math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
            (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * w.length / avgdl)))
        }
        if (cs.isEmpty) None
        else Some((id, BigDecimal(cs.sum).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble, cs.size.toLong))
      }
      val want = scored.sortBy { case (id, sc, _) => (-sc, id) }.take(15)
      val got = Scoring.bm25Topk(spark, dir).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      val ok = got.length == want.length && got.zip(want).forall {
        case ((gi, gs, gn), (wi, ws, wn)) =>
          gi == wi && math.abs(gs - ws) < 1e-3 && gn == wn
      }
      Prop(ok) :| s"got=$got want=$want"
    }

  property("importance_weights equals the brute-force DSIR on random corpora") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      val B = 256
      val toks = corpus.flatMap { case (_, t, l) =>
        t.split(" ").map(x => (Portable.hash28Jvm(x) % B, l))
      }
      val cRaw = toks.groupBy(_._1).map { case (b, v) => (b, v.size.toDouble) }
      val cTgt = toks.filter(_._2 == "en").groupBy(_._1)
        .map { case (b, v) => (b, v.size.toDouble) }
      val nRaw = toks.size.toDouble
      val nTgt = toks.count(_._2 == "en").toDouble
      def lr(b: Long) =
        math.log((cTgt.getOrElse(b, 0.0) + 1.0) / (nTgt + B)) -
          math.log((cRaw.getOrElse(b, 0.0) + 1.0) / (nRaw + B))
      val expected = corpus.map { case (id, t, _) =>
        val w = t.split(" ")
        (id, (w.length.toLong, w.map(x => lr(Portable.hash28Jvm(x) % B)).sum))
      }.toMap
      val got = Scoring.importanceWeights(spark, dir).collect()
      val ok = got.length == corpus.length && got.forall { r =>
        val (nt, lw) = expected(r.getLong(0))
        val lwR = BigDecimal(lw).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        r.getLong(1) == nt && math.abs(r.getDouble(2) - lw) < 1e-3 &&
          r.getBoolean(3) == lwR > 0
      }
      Prop(ok) :| s"n=${corpus.length}"
    }
}
