package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.{Dedup, TextAnalysis}

/** Randomized corpora through the round-10 curation reports vs plain-Scala
  * brute-force references — the `ScoringProps` discipline: tiny
  * vocabularies force dense collisions, multi-source corpora exercise the
  * rollup keys, and short documents exercise the no-gram branches. Each
  * case stages its corpus as a real parquet documents table so the
  * operators run their actual read path.
  */
object CurationProps extends Properties("Curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkTestSession.spark
  private lazy val scratch =
    graft.operators.Scratch.tempParent("graft-curation-props").toString
  private val caseId = new java.util.concurrent.atomic.AtomicInteger(0)

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 16) // 1-2-token docs have no trigrams
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  /** (doc_id, text, source) with doc_id 0..n-1, so doc 0 is the benchmark
    * split (doc_id % 97 == 0 for every n < 97 exactly once). */
  private val corpusGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.chooseNum(4, 30)
    texts <- Gen.listOfN(n, docGen)
    srcs <- Gen.listOfN(n, Gen.oneOf("sA", "sB", "sC"))
  } yield texts.zip(srcs).zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }

  private def stage(corpus: List[(Long, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = s"$scratch/case${caseId.incrementAndGet()}"
    corpus.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  /** Exact interpolated percentile — the `percentile`/`quantile_cont`
    * definition: rank p·(n−1) into the sorted values. */
  private def pct(sorted: Vector[Long], p: Double): Double = {
    val rank = p * (sorted.length - 1)
    val lo = math.floor(rank).toInt; val hi = math.ceil(rank).toInt
    sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  property("curriculum_buckets equals the brute-force quartile assignment") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      val ns = corpus.map { case (id, t, _) => id -> t.split(" ").length.toLong }
      val sorted = ns.map(_._2).sorted.toVector
      val Seq(q25, q50, q75) =
        Seq(0.25, 0.5, 0.75).map(p => round4(pct(sorted, p)))
      val buckets = ns.groupBy { case (_, n) =>
        1 + (if (n > q25) 1 else 0) + (if (n > q50) 1 else 0) +
          (if (n > q75) 1 else 0)
      }
      val expected = buckets.map { case (b, docs) =>
        b -> (docs.size.toLong, docs.map(_._2).sum,
          docs.map(_._2).min, docs.map(_._2).max)
      }
      val got = TextAnalysis.curriculumBuckets(spark, dir).collect()
        .map(r => r.getAs[Int]("bucket") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
            r.getAs[Long]("min_tokens"), r.getAs[Long]("max_tokens"))).toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("vocab_coverage(topK=2) equals the brute-force coverage audit") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      val toks = corpus.flatMap { case (_, t, src) => t.split(" ").map(src -> _) }
      val gcnt = toks.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      val vocab2 = gcnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(2).map(_._1).toSet
      val expected = toks.groupBy(_._1).map { case (src, ts) =>
        val n = ts.size.toLong
        val cov = ts.count(t => vocab2(t._2)).toLong
        val oovTypes = ts.map(_._2).filterNot(vocab2).distinct.size.toLong
        src -> (n, cov, (n - cov) * 10000 / n, oovTypes)
      }
      val got = TextAnalysis.vocabCoverage(spark, dir, topK = 2).collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("covered_tokens"),
            r.getAs[Long]("oov_bp"), r.getAs[Long]("oov_types"))).toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("ngram_top_per_source equals the brute-force per-source top-3") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      val bgs = corpus.flatMap { case (_, t, src) =>
        t.split(" ").sliding(2).filter(_.length == 2)
          .map(a => src -> s"${a(0)} ${a(1)}")
      }
      val expected = bgs.groupBy(_._1).flatMap { case (src, pairs) =>
        val counts = pairs.groupBy(_._2).map { case (bg, v) => bg -> v.size.toLong }
        val tot = counts.values.sum
        counts.toSeq.sortBy { case (bg, c) => (-c, bg) }.take(3).zipWithIndex
          .map { case ((bg, c), i) =>
            (src, i + 1) -> (bg, c, c * 10000 / tot) }
      }
      val got = TextAnalysis.ngramTopPerSource(spark, dir).collect()
        .map(r => (r.getString(0), r.getAs[Int]("rank")) ->
          (r.getString(2), r.getAs[Long]("cnt"), r.getAs[Long]("share_bp"))).toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("shard_assignment equals the brute-force hash shuffle") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      val brute = corpus.map { case (id, t, _) =>
        (id, t.split(" ").length.toLong,
          graft.functions.Portable.hash28Jvm(s"shard_$id") % 8,
          graft.functions.Portable.hash28Jvm(s"pos_$id"))
      }
      val expected = brute.groupBy(_._3).flatMap { case (shard, docs) =>
        docs.sortBy { case (id, _, _, k) => (k, id) }.zipWithIndex.map {
          case ((id, n, _, _), i) => id -> (shard, i + 1, n)
        }
      }
      val got = TextAnalysis.shardAssignment(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("shard"), r.getAs[Int]("pos"),
            r.getAs[Long]("n_tokens"))).toMap
      Prop(got == expected) :| s"got=${got.take(4)} expected=${expected.take(4)}"
    }

  property("mixture_temperature equals the brute-force sqrt reweighting") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      val per = corpus.groupBy(_._3).map { case (src, docs) =>
        src -> docs.map(_._2.split(" ").length.toLong).sum
      }
      val total = per.values.sum.toDouble
      val z = per.values.map(n => math.sqrt(n / total)).sum
      val expected = per.map { case (src, n) =>
        val p = n / total; val pq = math.sqrt(p)
        src -> (n, round4(p), round4(pq / z), round4((pq / z) / p))
      }
      val got = TextAnalysis.mixtureTemperature(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("n_tokens"), r.getAs[Double]("share"),
            r.getAs[Double]("sample_share"), r.getAs[Double]("boost"))).toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("contamination_by_source equals the brute-force trigram rollup") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      def grams(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val bench = corpus.filter(_._1 % 97 == 0).flatMap(c => grams(c._2)).toSet
      val train = corpus.filter(_._1 % 97 != 0)
      val expected = train.groupBy(_._3).map { case (src, docs) =>
        val per = docs.map(d => grams(d._2).count(bench))
        val nc = per.count(_ > 0).toLong
        src -> (docs.size.toLong, nc, nc * 10000 / docs.size,
          per.map(_.toLong).sum)
      }
      val got = Dedup.contaminationBySource(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_contaminated"),
            r.getAs[Long]("contamination_bp"), r.getAs[Long]("sum_shared_grams")))
        .toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("ngram_novelty equals the brute-force df=1 share per document") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      def grams(t: String): Set[String] =
        t.split(" ").sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      val perDoc = corpus.map { case (id, t, _) => id -> grams(t) }
      val df = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
      val expected = perDoc.map { case (id, gs) =>
        val n = gs.size.toLong
        val novel = gs.count(g => df(g) == 1).toLong
        id -> (n, novel, novel * 10000 / math.max(n, 1L))
      }.toMap
      val got = TextAnalysis.ngramNovelty(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_grams"), r.getAs[Long]("novel_grams"),
            r.getAs[Long]("novelty_bp"))).toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("collocations_pmi equals the brute-force contingency ranking") =
    Prop.forAll(corpusGen) { corpus =>
      val dir = stage(corpus)
      val pairs = corpus.flatMap(_._2.split(" ").sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))))
      val cxy = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cx = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val cy = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = pairs.size.toLong
      val expected = cxy.toSeq
        .filter(_._2 >= TextAnalysis.PmiMinCount)
        .map { case ((x, y), c) =>
          (s"$x $y", c, round4(math.log(n.toDouble * c / (cx(x) * cy(y)))))
        }
        .sortBy { case (bg, _, pmi) => (-pmi, bg) }
        .take(TextAnalysis.PmiTopK)
      val got = TextAnalysis.collocationsPmi(spark, dir).collect()
        .map(r => (r.getAs[String]("bg"), r.getAs[Long]("cnt"),
          r.getAs[Double]("pmi"))).toSeq
      Prop(got == expected) :| s"got=$got expected=$expected"
    }
}
