package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-operator sanity at sf0.001 (SURVEY.md §5 item 1). Exact-value
  * correctness is the driver's DuckDB oracle (scripts/check.py locally);
  * here: every registered query runs, plus targeted semantic assertions
  * for the non-SQL-expressible ones.
  */
class OperatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle name has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("corpus diff: statuses partition both snapshots, counts conserve") {
    import org.apache.spark.sql.functions._
    val diff = operators.DataQuality.corpusDiff(spark, sf)
      .groupBy("status").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sf).select("doc_id").cache()
    try {
      val total = docs.count()
      val added = docs.filter(col("doc_id") % 13 === 0).count()
      val removed = docs.filter(col("doc_id") % 19 === 0).count()
      val changed = docs.filter(col("doc_id") % 13 =!= 0 &&
        col("doc_id") % 17 === 0).count()
      // every status is MATERIAL at the smallest fixture (an empty cohort
      // would make the oracle vacuous for that branch)
      assert(Seq("added", "removed", "changed", "unchanged")
        .forall(st => diff.getOrElse(st, 0L) > 0), s"$diff")
      assert(diff("added") == added && diff("removed") == removed &&
        diff("changed") == changed, s"$diff vs ($added,$removed,$changed)")
      // the curr snapshot is exactly partitioned by added/changed/unchanged
      assert(diff("added") + diff("changed") + diff("unchanged") == total)
    } finally docs.unpersist()
  }

  test("approx_count_distinct within 5% of exact (HLL contract, in-query verdict)") {
    // the 5% bound lives IN the query as a verdict column the DuckDB
    // oracle asserts as TRUE; here we assert it holds at two SFs
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Relational.approxDistinct(spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Long]("exact_parts") > 0L)
        assert(r.getAs[Boolean]("approx_in_bound"),
          s"$dir: sketch drifted out of bound on ${r.getAs[String]("l_returnflag")}")
      }
    }
  }

  test("langid predicts only known languages, deterministic") {
    val rows = operators.TextAnalysis.textLangId(spark, sf).collect()
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(langs.contains(r.getAs[String]("predicted_lang"))))
    val again = operators.TextAnalysis.textLangId(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("near-dup detectors find the planted duplicates consistently") {
    val jacc = operators.Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(jacc.nonEmpty, "expected planted near-dups at jaccard >= 0.8")
    jacc.foreach { case (a, b) => assert(a < b) }
    // LSH candidates at est >= 0.5 must cover the true pairs at >= 0.8
    val lsh = operators.Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val recall = jacc.count(lsh.contains).toDouble / jacc.size
    assert(recall >= 0.9, s"LSH recall $recall over ${jacc.size} true pairs")
  }

  test("simhash banding emits exactly the brute-force Hamming<=3 pairs") {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    import org.apache.spark.sql.functions.col
    // recompute the fingerprints independently and brute-force the pairs;
    // the pigeonhole-banded operator must emit the identical set
    val sims = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .select(col("doc_id"),
        column(functions.SimHashBits(
          expression(functions.Portable.tokens(col("text"))), 28)).as("simhash"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("simhash")))
    val expected = (for {
      (a, ha) <- sims; (b, hb) <- sims
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb))).toSet
    assert(expected.nonEmpty, "fixture should contain planted near-dups")
    val got = operators.Dedup.dedupSimhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == expected,
      s"banded pairs diverge: missing=${expected -- got} extra=${got -- expected}")
  }

  test("jaccard stop-gram cap drops hot posting lists and reports the count") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    import spark.implicits._
    // docs 1,2: true near-dups — 9 shared rare grams + the hot gram; the
    // retained-vocabulary jaccard is exactly 1.0 (symmetric stop-gram
    // removal: the hot gram leaves the intersection AND both set sizes);
    // docs 3..302: identical {hot, dup} — BOTH grams exceed MaxPostingLen,
    // so without the cap they'd emit ~45k jaccard-1.0 pairs, with it none.
    val shared = (1 to 9).map(i => s"g$i")
    val gramSets = (
      Seq((1L, shared :+ "hot"), (2L, shared :+ "hot")) ++
        (3L to 302L).map(i => (i, Seq("hot", "dup")))
      ).toDF("doc_id", "grams")
    @volatile var audit: Option[Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("jaccard_audit").foreach(r => audit = Some(r))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val pairs = operators.Dedup.jaccardPairs(gramSets).collect()
      assert(pairs.length == 1, s"expected only the rare-gram pair, got ${pairs.length}")
      assert(pairs(0).getAs[Long]("doc_a") == 1L && pairs(0).getAs[Long]("doc_b") == 2L)
      assert(pairs(0).getAs[Double]("jaccard") == 1.0,
        "identical retained gram sets must score 1.0")
      val deadline = System.currentTimeMillis() + 10000
      while (audit.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val m = audit.getOrElse(fail("jaccard_audit metrics never arrived"))
      assert(m.getAs[Long]("stop_grams_dropped") == 2L, "hot + dup grams dropped")
    } finally spark.listenerManager.unregister(listener)
  }

  test("lsh plane count scales buckets: more planes partition strictly finer") {
    def buckets(planes: Int): Map[Long, Long] =
      operators.Similarity.annLshTopk(spark, sf, planes).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("bucket"))).toMap
    val coarse = buckets(4)
    val fine = buckets(8)
    assert(fine.values.toSet.size >= coarse.values.toSet.size,
      "more planes must not coarsen the bucketing")
    // plane p's bit is identical regardless of how many planes follow it, so
    // an 8-plane bucket id refines the 4-plane one: low 4 bits must agree
    fine.keySet.intersect(coarse.keySet).foreach { q =>
      assert((fine(q) & 0xfL) == coarse(q),
        s"query $q: 8-plane bucket ${fine(q)} does not refine 4-plane ${coarse(q)}")
    }
  }

  test("hll union estimates bound exact distinct counts within sketch error") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    // at both fixture SFs: every per-source estimate and the merged union
    // estimate sit within the published 3-RSE bound of their exact twins
    // (the driver's DuckDB oracle re-asserts this at sf0.01 by comparing
    // the verdict columns against literals), and the exact columns agree
    // with an independent computation
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val got = operators.Relational.hllUnionSources(spark, dir).collect()(0)
      val exact = Tables.documents(spark, dir)
        .select(functions.Portable.docFingerprint.as("fp"))
        .agg(countDistinct(col("fp"))).collect()(0).getLong(0)
      assert(got.getAs[Long]("exact_union") == exact)
      assert(got.getAs[Boolean]("union_in_bound"),
        s"$dir: union estimate outside 5% of exact=$exact")
      assert(got.getAs[Long]("n_sources_in_bound") == got.getAs[Long]("n_sources"),
        s"$dir: ${got.getAs[Long]("n_sources") - got.getAs[Long]("n_sources_in_bound")}" +
          " per-source estimates out of bound")
      // true duplicate mass is non-negative by construction
      assert(got.getAs[Long]("exact_cross_source_dups") >= 0L)
    }
  }

  test("row id assignment is dense and token offsets telescope") {
    val rows = operators.Packing.assignRowIds(spark, sf).collect()
      .sortBy(_.getAs[Long]("row_id"))
    assert(rows.map(_.getAs[Long]("row_id")).toSeq == rows.indices.map(_.toLong),
      "row ids must be 0..n-1 with no gaps")
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq ==
      rows.map(_.getAs[Long]("doc_id")).sorted.toSeq,
      "row id order must follow doc_id order")
    assert(rows.head.getAs[Long]("start_tok") == 0L)
    // offsets form a strictly increasing global prefix sum (every doc has at
    // least one token), i.e. partition offsets composed without overlap/gap
    val offs = rows.map(_.getAs[Long]("start_tok"))
    assert(offs.zip(offs.tail).forall { case (a, b) => a < b },
      "start_tok must be strictly increasing across partition boundaries")
  }

  test("span dedup keeps only the first occurrence of corpus-hot spans") {
    val rows = operators.Dedup.dedupSpans(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_spans"))
      assert(r.getAs[Long]("n_dropped") >= 0)
    }
    // the fixtures contain exact-duplicate documents, so identical spans DO
    // cross the hot threshold and later copies must have lost spans while
    // the corpus-first copy keeps everything
    val docsWithDrops = rows.count(_.getAs[Long]("n_dropped") > 0)
    assert(docsWithDrops > 0, "fixture duplicates must trigger span drops")
  }

  test("misra-gries sketch: bounds hold and heavy items survive in the lossy regime") {
    import functions.{FrequentItem, FrequentItemsAggregator}
    import org.apache.spark.sql.functions.{col, udaf}
    import spark.implicits._
    // 40 distinct items vs capacity 8: decrements MUST fire. One item holds
    // ~1/3 of all mass (far above n/(capacity+1)), so MG guarantees it is
    // retained; every estimate must bracket the true count within err_bound.
    val items = (1 to 2000).map(_ => "heavy") ++
      (1 to 39).flatMap(i => Seq.fill(100)(s"t$i"))
    val truth = items.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val fi = udaf(new FrequentItemsAggregator(8))
    val out = items.toDF("item").repartition(8)
      .agg(fi(col("item")).as("s"))
      .select(org.apache.spark.sql.functions.explode(col("s")).as("f"))
      .select("f.*").as[FrequentItem].collect()
    assert(out.nonEmpty && out.length <= 8)
    out.foreach { f =>
      val t = truth(f.item)
      assert(f.est_count <= t, s"${f.item}: est ${f.est_count} > true $t")
      assert(t <= f.est_count + f.err_bound,
        s"${f.item}: true $t above est+err ${f.est_count + f.err_bound}")
    }
    assert(out.exists(_.item == "heavy"), "item above n/(k+1) frequency must be retained")
    assert(out.head.est_count == out.map(_.est_count).max, "output sorted by estimate desc")
  }

  test("ann topk: 5 ranked neighbors per query, self excluded") {
    val rows = operators.Similarity.annBruteforceTopk(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (qid, rs) =>
      assert(qid % 100 == 0)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
      rs.foreach(r => assert(r.getAs[Long]("vec_id") != qid))
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "descending")
    }
  }

  test("trained IVF recalls brute-force top-3 at least as well as untrained") {
    def top3(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.filter(_.getAs[Int]("rank") <= 3)
        .groupBy(_.getAs[Long]("qid"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val truth = top3(operators.Similarity.annBruteforceTopk(spark, sf).collect())
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t).toDouble / t.size }
        .sum / truth.size
    val untrained = recall(top3(operators.Similarity.annIvfTopk(spark, sf).collect()))
    val trained = recall(top3(operators.Similarity.annIvfTrainedTopk(spark, sf).collect()))
    assert(trained >= untrained,
      s"k-means codebook must not lose recall: trained=$trained untrained=$untrained")
    assert(trained > 0.0, "trained IVF found none of the true neighbors")
  }

  test("multimodal decode stub: plumbing yields plausible typed metadata") {
    val rows = operators.Multimodal.multimodalDecode(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 64 && w < 128); assert(h >= 64 && h < 128)
      assert(r.getAs[Int]("n_frames") >= 1 && r.getAs[Int]("n_frames") <= 5)
    }
  }

  test("multimodal chunks: empty payload emits zero chunk rows (oracle parity)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-").toString
    Seq((1L, ""), (2L, "x" * 300)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Multimodal.multimodalChunks(spark, dir).collect()
    // empty doc: DuckDB's range(0, 0) emits nothing — so must we
    assert(!rows.exists(_.getAs[Long]("doc_id") == 1L), "empty doc fabricated chunks")
    assert(rows.count(_.getAs[Long]("doc_id") == 2L) == 2) // 300 bytes → 2 chunks
  }

  test("rolling hash folds Unicode code points (non-BMP oracle parity)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-").toString
    // "a😀b": code points 97, 128512, 98 — charAt would see 4 UTF-16 units
    Seq((1L, "a😀b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val h = operators.TextAnalysis.textRollingHash(spark, dir)
      .collect()(0).getAs[Long]("rhash")
    val expected = Seq(97L, 128512L, 98L)
      .foldLeft(0L)((acc, c) => (acc * 31 + c) % 2147483647L)
    assert(h == expected, s"got $h, expected code-point fold $expected")
  }

  test("observe metrics report input and malformed counts in one pass (O2 log parity)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    @volatile var audit: Option[Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("parse_audit").foreach(r => audit = Some(r))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = operators.BeamParity.demo1MalformedObserved(spark, sf).collect()
      assert(out.map(_.getAs[Long]("n_parsed")).sum > 0)
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (audit.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val m = audit.getOrElse(fail("parse_audit metrics never arrived"))
      val events = Tables.events(spark, sf)
      assert(m.getAs[Long]("n_input") == events.count())
      assert(m.getAs[Long]("n_malformed") ==
        events.filter(org.apache.spark.sql.functions.expr("event_id % 7 = 0")).count())
    } finally spark.listenerManager.unregister(listener)
  }

  test("percentile_approx within 1% of exact at p50 and p95 (sketch contract, in-query verdict)") {
    // the 1% bound lives IN the query as verdict columns the DuckDB
    // oracle asserts as TRUE; assert they hold at two SFs
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Relational.percentileApprox(spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Double]("p50_exact") > 0 && r.getAs[Double]("p95_exact") > 0)
        assert(r.getAs[Boolean]("p50_in_bound") && r.getAs[Boolean]("p95_in_bound"),
          s"$dir: GK sketch out of bound on ${r.getAs[String]("l_returnflag")}")
      }
    }
  }

  test("t-digest within 1% of exact at p50 and p95 (sketch contract, in-query verdict)") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Relational.percentileTdigest(spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Double]("p50_exact") > 0 && r.getAs[Double]("p95_exact") > 0)
        assert(r.getAs[Boolean]("p50_in_bound") && r.getAs[Boolean]("p95_in_bound"),
          s"$dir: t-digest out of bound on ${r.getAs[String]("l_returnflag")}")
      }
    }
  }

  test("t-digest merge is order-insensitive and matches exact quantiles directly") {
    val agg = new functions.TDigestAggregator(Seq(0.5, 0.95), 100)
    // deterministic skewed values (no RNG): x^2 spreads the tail
    val values = (1 to 10000).map(i => (i.toDouble * i) / 1000.0)
    val chunks = values.grouped(2500).toSeq
    val digests = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = agg.finish(digests.reduce(agg.merge))
    val mergedRev = agg.finish(digests.reverse.reduce(agg.merge))
    val sorted = values.sorted
    def exact(q: Double): Double = sorted((q * (sorted.size - 1)).round.toInt)
    for (((got, gotRev), q) <- merged.zip(mergedRev).zip(Seq(0.5, 0.95))) {
      assert(math.abs(got - exact(q)) / exact(q) < 0.01, s"q=$q got=$got exact=${exact(q)}")
      assert(math.abs(got - gotRev) / exact(q) < 0.005,
        s"merge order changed q=$q: $got vs $gotRev")
    }
  }

  test("sample split is deterministic, covers every doc, ratios near 80/10/10") {
    val a = operators.Relational.sampleSplit(spark, sf).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"))).toMap
    val b = operators.Relational.sampleSplit(spark, sf).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"))).toMap
    assert(a == b, "hash split must be stable across runs")
    val total = a.values.sum.toDouble
    assert(total.toLong == Tables.documents(spark, sf).count())
    // md5 buckets are uniform; at 500 docs allow generous slack per share
    for ((split, lo, hi) <- Seq(("train", 0.70, 0.90), ("val", 0.04, 0.16), ("test", 0.04, 0.16))) {
      val share = a.getOrElse(split, 0L).toDouble / total
      assert(share > lo && share < hi, s"$split share $share outside [$lo,$hi]")
    }
  }

  test("dedup clusters: components cover all paired docs, labels are component minima") {
    val pairs = operators.Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val clusters = operators.Dedup.dedupClusters(spark, sf).collect()
    val clustered = clusters.map(_.getAs[Long]("n_docs")).sum
    val pairedDocs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(clustered == pairedDocs.length, "every paired doc lands in exactly one cluster")
    // reference union-find on the collected pairs must agree
    val parent = scala.collection.mutable.Map(pairedDocs.map(x => x -> x): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairedDocs.groupBy(find).map { case (root, members) =>
      (members.min, members.length.toLong)
    }.toSet
    val got = clusters.map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"))).toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("leakage-safe split: no cluster straddles splits, real straddlers rescued") {
    val rows = operators.Dedup.splitLeakageSafe(spark, sf).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.documents(spark, sf).count(), "every doc gets exactly one split")
    // the fixture's near-dup families make the operator do real work: at
    // least one doc's naive (doc-keyed) split differs from its cluster's home
    assert(rows.map(_.getAs[Long]("n_docs_rescued")).sum > 0,
      "fixture should contain clusters the naive split would have straddled")
    val clusters = operators.Dedup.dedupClusters(spark, sf).collect()
    val clustered = clusters.map(_.getAs[Long]("n_docs")).sum
    assert(rows.map(_.getAs[Long]("n_neardup_docs")).sum == clustered,
      "near-dup doc census must match the cluster census")
    // the no-leakage proof: per-split distinct-label counts sum to the GLOBAL
    // label count (singletons + multi-doc clusters) — if any cluster reached
    // two splits it would be counted twice and the sum would exceed it
    val nClusters = rows.map(_.getAs[Long]("n_clusters")).sum
    assert(nClusters == (nDocs - clustered) + clusters.length,
      "a near-dup cluster straddles the split boundary")
  }

  test("skew diagnostic: single-row-broadcast median, map-side partial counts") {
    // sf0.01: the sf0.001 orders slice has no key above 2x median, so the
    // materiality assertion needs the bigger fixture (3 hot keys there,
    // re-checked by the DuckDB oracle at both SFs)
    val df = operators.Skew.skewDiagnostic(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    // the scaladoc's plan claims, enforced: the median attaches as a
    // single-row broadcast (never a real product) and per-key counts
    // combine map-side before their exchange
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_count"), plan)
    val rows = df.collect()
    assert(rows.nonEmpty, "fixture orders should contain >2x-median custkeys")
    // every reported key is >2x median, so its salt factor is at least 3
    assert(rows.forall(_.getAs[Long]("salt_factor") >= 3L))
  }

  test("soft dedup weights: docs conserved, retained mass equals cluster count") {
    val rows = operators.Dedup.dedupSoftWeights(spark, sf).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.documents(spark, sf).count(), "every doc is weighted")
    val clusters = operators.Dedup.dedupClusters(spark, sf).collect()
    val clustered = clusters.map(_.getAs[Long]("n_docs")).sum
    // total retained mass = corpus "effective size" = number of clusters
    // (each family contributes exactly one document's worth of mass)
    val mass = rows.map(_.getAs[Double]("retained_mass")).sum
    val nClusters = (nDocs - clustered) + clusters.length
    assert(math.abs(mass - nClusters) < 1e-6, s"mass $mass vs clusters $nClusters")
    // the fixture has real multi-doc families, so weighting does real work
    assert(rows.exists(r => r.getAs[Long]("cluster_size") > 1L &&
      r.getAs[Double]("doc_weight") < 1.0))
  }

  test("sessionize: session event counts sum to total events, sessions ordered") {
    val sessions = operators.TimeSeries.sessionizeGaps(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == total)
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val byId = ss.sortBy(_.getAs[Long]("sess_id"))
      byId.foreach(r => assert(r.getAs[Long]("start_s") <= r.getAs[Long]("end_s")))
      // consecutive sessions of a user do not overlap and honor the 24h gap
      byId.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_s") - a.getAs[Long]("end_s") > 24 * 3600L)
        case _ =>
      }
    }
  }

  test("sessionize is invariant to input row order, including timestamp ties") {
    import spark.implicits._
    // synthetic events with DUPLICATE timestamps per user (the tie case the
    // RANGE cumulative frame must make order-proof) — ts stored as int64
    // nanos, the fixture wire format Tables.events expects
    val base = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-03 09:00:00"), (1L, "2024-01-03 09:00:00"),
      (2L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:00:05"))
      .map { case (u, t) => (u, java.sql.Timestamp.valueOf(t).getTime * 1000000L) }
    def writeDir(rows: Seq[(Long, Long)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-sess-").toString
      rows.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val fwd = operators.TimeSeries.sessionizeGaps(spark, writeDir(base)).collect()
    val rev = operators.TimeSeries.sessionizeGaps(spark, writeDir(base.reverse)).collect()
    assert(fwd.map(_.toString).toSeq == rev.map(_.toString).toSeq,
      s"fwd=${fwd.mkString(";")} rev=${rev.mkString(";")}")
    // user 1: two sessions (gap > 24h); user 2: one session of 2 events
    val u1 = fwd.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 2 && u1.forall(_.getAs[Long]("n_events") == 2L))
    val u2 = fwd.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 1 && u2(0).getAs[Long]("n_events") == 2L)
  }

  test("gap fill: hourly grid is dense per user and zeros fill the gaps") {
    val rows = operators.TimeSeries.gapFillResample(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val hours = rs.map(_.getAs[Long]("hour_s")).sorted
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600L },
        "grid must be contiguous hourly steps")
    }
    assert(rows.exists(_.getAs[Long]("n_events") == 0L), "expected filled gaps")
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf).filter(org.apache.spark.sql.functions.col("user_id") < 20).count())
  }

  test("tfidf: 3 ranked terms per doc, scores descending") {
    val rows = operators.TextAnalysis.textTfidf(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length) &&
        rs.length <= 3)
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("centroid aggregator matches per-dimension average (UDAF contract)") {
    import org.apache.spark.sql.functions._
    val got = operators.Similarity.centroidByLabel(spark, sf)
      .filter(col("label") === 0 && col("dim") === 0).collect()
    val expected = Tables.embeddings(spark, sf)
      .filter(col("label") === 0)
      .select(round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("v"))
      .collect()(0).getAs[Double]("v")
    assert(got.length == 1)
    assert(math.abs(got(0).getAs[Double]("centroid_val") - expected) < 1e-9)
  }

  test("embedding LSH dedup: pairs subset of exact pairs, recall >= 0.9") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val exact = pairs(operators.Dedup.dedupEmbedding(spark, dir))
      val lsh = pairs(operators.Similarity.dedupEmbeddingLsh(spark, dir))
      assert(exact.nonEmpty, s"$dir: fixture has no exact near-dup pairs to recall")
      // banded candidates are a strict filter on the same scored pair set
      assert(lsh.subsetOf(exact),
        s"$dir: LSH emitted non-exact pairs ${(lsh -- exact).take(5)}")
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.9, s"$dir: recall $recall over ${exact.size} exact pairs")
    }
  }

  /** Root paths of every parquet relation in the optimized plan. */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case _ => ""
        }
    }

  test("indexed incremental dedup: read path scans batch docs + index only, output identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-index-spec").toString
    // maintenance half: derive history artifacts once
    operators.Dedup.writeDedupIndex(spark, sf, dir)
    // increment half: must never touch history TEXT again
    val read = operators.Dedup.dedupIncrementalFromIndex(spark, sf, dir)
    val docScans = scanPaths(read).filter(_.contains("documents.parquet"))
    assert(docScans.size == 2,
      s"read path has ${docScans.size} documents scans (want 2: batch fp + batch bands)")
    val idxScans = scanPaths(read).filter(_.contains(dir))
    assert(idxScans.exists(_.endsWith("/fp")) && idxScans.exists(_.endsWith("/bands")),
      s"read path misses index artifacts: $idxScans")
    // every documents scan sits under the batch filter — history rows are
    // excluded before any join
    val docFilters = read.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.collect {
            case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
          }.nonEmpty => f.condition.sql
    }
    assert(docFilters.count(_.contains("% 10L) >= 8L")) >= 2,
      s"batch filters missing from documents scans: $docFilters")
    // the from-scratch variant pays 4 documents scans (history + batch, ×2
    // artifacts) — the index is exactly the 2 history scans it amortizes
    val scratchDocScans =
      scanPaths(operators.Dedup.dedupIncremental(spark, sf)).filter(_.contains("documents.parquet"))
    assert(scratchDocScans.size == 4, s"expected 4 scans, got ${scratchDocScans.size}")
    // and the increment's answer is identical either way
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("match_type"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_near"))).toSeq
    assert(rows(read) == rows(operators.Dedup.dedupIncremental(spark, sf)))
  }

  test("merge upsert: deleted keys absent, update/insert provenance counts exact") {
    val r = operators.Relational.mergeUpsert(spark, sf).collect()
      .map(x => x.getAs[String]("src") -> x.getAs[Long]("n_rows")).toMap
    assert(r.keySet == Set("kept", "updated", "inserted"))
    // first-principles expectations straight off the raw key column
    val keys = Tables.orders(spark, sf).select("o_orderkey").collect().map(_.getLong(0))
    val snapshot = keys.count(_ % 10 < 8)
    val deleted = keys.count(_ % 10 == 6)
    val updated = keys.count(k => k % 10 == 0 || k % 10 == 4)
    val inserted = keys.count(_ % 10 == 8)
    assert(r("kept") == snapshot - deleted - updated,
      s"kept ${r("kept")} != $snapshot - $deleted - $updated")
    assert(r("updated") == updated && r("inserted") == inserted)
    assert(deleted > 0, "fixture exercises no deletes")
  }

  test("pq: ADC distance equals distance to the codes' reconstruction") {
    val enc = operators.Similarity.pqEncode(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (0 until 8).map(s => r.getAs[Int](s"code_$s")).toArray).toMap
    assert(enc.nonEmpty && enc.values.forall(_.forall(c => c >= 0 && c < 16)))
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def recon(codes: Array[Int]): Array[Double] =
      Array.tabulate(64)(i =>
        operators.Similarity.pqCentroid(i / 8, codes(i / 8), i % 8))
    val adc = operators.Similarity.pqAdcTopk(spark, sf).collect()
    assert(adc.nonEmpty)
    for (r <- adc.take(20)) {
      val q = emb(r.getAs[Long]("qid"))
      val rec = recon(enc(r.getAs[Long]("vec_id")))
      // the asymmetric distance IS ||q - recon(x)||^2: eight table lookups
      // must reproduce the full 64-dim sum against the reconstruction
      val direct = q.zip(rec).map { case (a, b) =>
        val e = a.toDouble - b; e * e
      }.sum
      assert(math.abs(r.getAs[Double]("adc") - direct) < 1e-4 + 1e-9,
        s"qid=${r.getAs[Long]("qid")} vec=${r.getAs[Long]("vec_id")}: " +
          s"adc=${r.getAs[Double]("adc")} direct=$direct")
    }
  }

  test("ivf-pq: composition equals a plain-Scala IVFADC recompute") {
    // Independent oracle: no Catalyst expressions — plain loops re-derive
    // cell routing (rounded-cosine argmax over the first-8 codebook), PQ
    // codes, distance tables, and the per-cell ADC top-3.
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
      .sortBy(_._1)
    def round(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def norm(v: Array[Float]) = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    val cents = emb.filter(_._1 < 8)
    def cell(v: Array[Float]): Int =
      cents.map { case (cid, c) =>
        val dot = v.zip(c).map { case (a, b) => a.toDouble * b.toDouble }.sum
        (round(dot / (norm(v) * norm(c)), 6), -cid.toInt)
      }.zipWithIndex.maxBy(_._1)._2
    def dists(v: Array[Float], s: Int): Array[Double] =
      Array.tabulate(16) { j =>
        (0 until 8).map { i =>
          val e = v(s * 8 + i).toDouble - operators.Similarity.pqCentroid(s, j, i)
          e * e
        }.sum
      }
    def codes(v: Array[Float]): Array[Int] =
      Array.tabulate(8)(s => dists(v, s).zipWithIndex.minBy(_._1)._2)
    val cellOf = emb.map { case (id, v) => id -> cell(v) }.toMap
    val codeOf = emb.map { case (id, v) => id -> codes(v) }.toMap
    val expected = emb.filter(_._1 % 100 == 0).flatMap { case (qid, qv) =>
      val qc = cellOf(qid)
      val dt = Array.tabulate(8)(s => dists(qv, s))
      emb.filter { case (id, _) => id != qid && cellOf(id) == qc }
        .map { case (id, _) =>
          val adc = (0 until 8).map(s => dt(s)(codeOf(id)(s))).sum
          (qid, qc, id, round(adc, 4))
        }
        .sortBy { case (_, _, id, adc) => (adc, id) }
        .take(3).zipWithIndex
        .map { case ((q, c, id, adc), i) => (q, c, i + 1, id, adc) }
    }
    val got = operators.Similarity.annIvfPqTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cell").toInt,
        r.getAs[Int]("rank"), r.getAs[Long]("vec_id"), r.getAs[Double]("adc")))
    assert(got.nonEmpty && got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4,
        s"row mismatch: got $g expected $e")
      assert(math.abs(g._5 - e._5) < 1e-9, s"adc mismatch: got $g expected $e")
    }
  }

  test("z-order layout: 2-D predicate prunes row groups a 1-D sort cannot") {
    import org.apache.spark.sql.functions.expr
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val out = java.nio.file.Files.createTempDirectory("graft-zorder-spec").toString
      operators.Packing.writeZorderLayouts(spark, dir, out)
      // (result rows, rows the parquet scan emitted after row-group
      // min/max pruning + pushdown — the layout-dependent number)
      def run(layout: String): (Long, Long) = {
        val df = spark.read.parquet(s"$out/$layout")
          .filter(expr(operators.Packing.ZPredicate))
        val result = df.collect().length.toLong
        val scanned = df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }.sum
        (result, scanned)
      }
      val (zRes, zScan) = run("zorder")
      val (lRes, lScan) = run("linear")
      val total = spark.read.parquet(s"$out/zorder").count()
      assert(zRes == lRes && zRes > 0, s"$dir: layouts disagree: $zRes vs $lRes")
      // the z-order layout's row-group stats are narrow in BOTH keys: the
      // scan must surface strictly fewer rows than under the xk-only sort,
      // and both layouts must beat a full scan
      assert(zScan < lScan,
        s"$dir: z-order scanned $zScan rows, 1-D sort scanned $lScan")
      assert(lScan < total, s"$dir: 1-D layout pruned nothing ($lScan of $total)")
    }
  }

  test("zorderPruning: two concurrent invocations do not race their scratch dirs") {
    // each call writes its layouts into its own UUID subdir, so neither
    // run's OVERWRITE can clobber the other's lazy parquet read
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val expected = operators.Packing.zorderPruning(spark, sf).collect().map(_.toSeq)
    val runs = Seq(
      Future(operators.Packing.zorderPruning(spark, sf).collect().map(_.toSeq)),
      Future(operators.Packing.zorderPruning(spark, sf).collect().map(_.toSeq)))
    Await.result(Future.sequence(runs), 5.minutes).foreach { got =>
      assert(got.toSeq == expected.toSeq,
        s"concurrent run diverged: ${got.toSeq} vs ${expected.toSeq}")
    }
  }

  test("IVF nprobe=2 recall is >= single-probe recall against brute-force truth") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val truth = pairs(operators.Similarity.annBruteforceTopk(spark, dir)
        .filter(org.apache.spark.sql.functions.col("rank") <= 3))
      val p1 = pairs(operators.Similarity.annIvfTopk(spark, dir))
      val p2 = pairs(operators.Similarity.annIvfNprobeTopk(spark, dir))
      val r1 = (p1 & truth).size.toDouble / truth.size
      val r2 = (p2 & truth).size.toDouble / truth.size
      assert(r2 >= r1, s"$dir: nprobe=2 recall $r2 below single-probe $r1")
      assert(r2 > 0.0, s"$dir: nprobe recall degenerate")
    }
  }

  test("small-file compaction: metadata-planned file count, rows preserved, bounded files") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val smallDir = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    // a streaming sink's pathology: 64 tiny files
    Tables.documents(spark, sf).repartition(64).write.mode("overwrite").parquet(smallDir)
    val nFilesIn = new java.io.File(smallDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFilesIn == 64)
    val totalBytes = new java.io.File(smallDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val parts = operators.Packing.compactFiles(
      spark, smallDir, outDir, targetBytes = totalBytes / 4)
    val outFiles = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(outFiles.length == parts && parts < nFilesIn,
      s"wanted $parts compacted files, got ${outFiles.length} (from $nFilesIn)")
    // nothing lost, nothing duplicated, and round-robin kept files even
    val back = spark.read.parquet(outDir)
    assert(back.count() == Tables.documents(spark, sf).count())
    assert(back.select("doc_id").distinct().count() == back.count())
    val perFile = back.groupBy(input_file_name()).count()
      .collect().map(_.getAs[Long]("count"))
    assert(perFile.max <= 2L * perFile.min,
      s"uneven compaction: ${perFile.toSeq.sorted}")
    // partitioned input (the streaming-sink shape: files under subdirs) —
    // sizing must see the nested files, not a 0-byte top level
    val partDir = java.nio.file.Files.createTempDirectory("graft-compact-part").toString
    val partOut = java.nio.file.Files.createTempDirectory("graft-compact-pout").toString
    Tables.documents(spark, sf).repartition(8)
      .write.partitionBy("lang").mode("overwrite").parquet(partDir)
    val partBytes = {
      def walk(f: java.io.File): Long =
        if (f.isFile) { if (f.getName.endsWith(".parquet")) f.length() else 0L }
        else Option(f.listFiles()).toSeq.flatten.map(walk).sum
      walk(new java.io.File(partDir))
    }
    val pParts = operators.Packing.compactFiles(
      spark, partDir, partOut, targetBytes = partBytes / 3)
    assert(pParts > 1, "partitioned input sized as empty (planned 1 partition)")
    assert(spark.read.parquet(partOut).count() ==
      Tables.documents(spark, sf).count())
  }

  test("order-preserving compaction composes with z-order: pruning inequality survives") {
    import org.apache.spark.sql.functions.{col, expr, input_file_name, max => smax, min => smin}
    val dir = "/root/testdata/sf0.01"
    val out = java.nio.file.Files.createTempDirectory("graft-zcompact").toString
    try {
    operators.Packing.writeZorderLayouts(spark, dir, out)
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    // targetBytes = 2x the largest input file -> deterministic adjacent
    // pairs: every output file merges exactly two neighboring range files
    def compact(layout: String, sortCol: String): Int = {
      val target = 2L * parquetFiles(s"$out/$layout").map(_.length()).max
      operators.Packing.compactFilesOrdered(spark, s"$out/$layout",
        s"$out/${layout}_c", target, Seq(sortCol))
    }
    val zGroups = compact("zorder", "zval")
    val lGroups = compact("linear", "xk")
    assert(zGroups == operators.Packing.ZLayoutFiles / 2 &&
      parquetFiles(s"$out/zorder_c").length == zGroups,
      s"expected ${operators.Packing.ZLayoutFiles / 2} merged files, planned $zGroups")
    // nothing lost, and compaction kept sizes even (adjacent range files
    // are ~equal, so pairs stay within 2x of each other)
    val back = spark.read.parquet(s"$out/zorder_c")
    val total = spark.read.parquet(s"$out/zorder").count()
    assert(back.count() == total)
    val perFile = back.groupBy(input_file_name()).count()
      .collect().map(_.getAs[Long]("count"))
    assert(perFile.length == zGroups && perFile.max <= 2L * perFile.min,
      s"uneven ordered compaction: ${perFile.toSeq.sorted}")
    // ORDER preservation: each output file covers a contiguous zval slice,
    // and the slices do not overlap across files — the property round-robin
    // compaction destroys and min/max pruning depends on
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(smin("zval").as("lo"), smax("zval").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping zval ranges after compaction: $ranges")
      case _ =>
    }
    // the inequality OperatorSpec's z-order test proves at 16 files must
    // survive compaction to 8: the compacted z-order layout still scans
    // strictly fewer rows than the compacted 1-D layout under the 2-D
    // predicate, and both still beat a full scan
    def scanned(layout: String): (Long, Long) = {
      val df = spark.read.parquet(s"$out/$layout")
        .filter(expr(operators.Packing.ZPredicate))
      val res = df.collect().length.toLong
      val sc = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
      (res, sc)
    }
    val (zRes, zScan) = scanned("zorder_c")
    val (lRes, lScan) = scanned("linear_c")
    assert(zRes == lRes && zRes > 0, s"compacted layouts disagree: $zRes vs $lRes")
    assert(zScan < lScan,
      s"ordered compaction lost z-order pruning: z scanned $zScan, linear $lScan")
    assert(lScan < total, s"compacted 1-D layout pruned nothing ($lScan of $total)")
    // and the round-robin mode on the same input, as documented, does NOT
    // preserve the layout: its per-file zval ranges overlap
    operators.Packing.compactFiles(spark, s"$out/zorder", s"$out/zorder_rr",
      targetBytes = 2L * parquetFiles(s"$out/zorder").map(_.length()).max)
    val rrRanges = spark.read.parquet(s"$out/zorder_rr")
      .groupBy(input_file_name().as("f"))
      .agg(smin("zval").as("lo"), smax("zval").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    val rrOverlaps = rrRanges.sliding(2).exists {
      case Array((_, hi), (lo2, _)) => hi > lo2
      case _ => false
    }
    assert(rrRanges.length <= 1 || rrOverlaps,
      "round-robin compaction unexpectedly preserved range clustering")
    } finally SparkTestSession.deleteRecursively(out)
  }

  test("column profile runs in ONE documents scan; stats agree with the frame") {
    val prof = operators.DataQuality.profileColumns(spark, sf)
    assert(scanPaths(prof).count(_.contains("documents.parquet")) == 1,
      "profile must be a single-pass aggregate, not per-column re-scans")
    val rows = prof.collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val docs = Tables.documents(spark, sf).cache()
    try {
      val n = docs.count()
      assert(rows.keySet == Set("doc_id", "lang", "n_chars", "source", "text"))
      rows.values.foreach(r => assert(r.getAs[Long]("n_rows") == n))
      assert(rows("doc_id").getAs[Long]("n_distinct") == n) // ids unique
      assert(rows("lang").getAs[Long]("n_nulls") == 0L)
    } finally { docs.unpersist(); () }
  }

  test("mixture drift: KL terms sum >= 0, TV in [0, 1/2] per source") {
    val rs = operators.DataQuality.mixtureDrift(spark, sf).collect()
    assert(rs.nonEmpty)
    // complete support on the fixture: no NULL (infinite) terms, and the
    // term-sum of KL(A||B) over a full distribution is Gibbs-nonnegative
    assert(rs.forall(!_.isNullAt(rs.head.fieldIndex("kl_term"))))
    val kl = rs.map(_.getAs[Double]("kl_term")).sum
    assert(kl >= -1e-9, s"KL sum $kl negative")
    rs.foreach { r =>
      val tv = r.getAs[Double]("tv_term")
      assert(tv >= 0.0 && tv <= 0.5, s"tv term $tv out of range")
    }
  }

  test("weighted sample: kept rate tracks mean weight per language") {
    operators.DataQuality.sampleWeighted(spark, sf).collect().foreach { r =>
      val rate = r.getAs[Double]("kept_rate")
      val w = r.getAs[Double]("avg_weight")
      val n = r.getAs[Long]("n_total")
      // binomial tolerance: 4 sigma at the stratum's size
      val tol = 4.0 * math.sqrt(w * (1 - w) / n) + 0.05
      assert(math.abs(rate - w) <= tol,
        s"lang ${r.getAs[String]("lang")}: kept $rate vs weight $w (n=$n)")
    }
  }

  test("count-min grid aggregates map-side partials (mergeable-sketch plan shape)") {
    val df = operators.Relational.cmsUserCounts(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the merge-exactness claim at plan level: the UDAF must plan a
    // partial ObjectHashAggregate per input partition (executor-local
    // grids) with one final merge — not a single-partition pass
    assert(plan.contains("partial_countminaggregator"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    // the single-row sketch attaches as a broadcast, never a real product
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val rows = df.collect()
    assert(rows.length == Tables.events(spark, sf)
      .select("user_id").distinct().count().toInt)
    // overcount-only guarantee on the real fixture, and every row in bound
    assert(rows.forall(_.getAs[Long]("overcount") >= 0L))
    assert(rows.forall(_.getAs[Boolean]("in_bound")))
  }

  test("applyChangeLog plans a combinable hash aggregate, never a window sort") {
    import spark.implicits._
    val snap = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val log = Seq((1L, 1L, "U", 11L), (3L, 1L, "I", 30L)).toDF("k", "seq", "op", "v")
    val plan = operators.Relational.applyChangeLog(snap, log, "k", "seq", "op")
      .queryExecution.executedPlan.toString
    // the last-change reduction must be a partial+final aggregate (the
    // map-side-combinable scaladoc claim — partial_max collapses each key
    // before the shuffle; struct buffers plan SortAggregate, not Hash);
    // a row_number formulation would plan a Window over every raw log row
    assert(plan.contains("partial_max"), plan)
    assert(!plan.contains("Window"), plan)
    // loud preconditions: payload mismatch and reserved-name collisions
    val bad = Seq((1L, 1L, "U", 11L)).toDF("k", "seq", "op", "other")
    val e1 = intercept[IllegalArgumentException] {
      operators.Relational.applyChangeLog(snap, bad, "k", "seq", "op")
    }
    assert(e1.getMessage.contains("payload"))
    val e2 = intercept[IllegalArgumentException] {
      operators.Relational.applyChangeLog(
        snap.withColumn("__cdc_src",
          org.apache.spark.sql.functions.lit("x")), log, "k", "seq", "op")
    }
    assert(e2.getMessage.contains("__cdc_src"))
    // a null op is invalid input, not a silent 'kept' — raises at runtime
    val nullOp = Seq((1L, 1L, "U", 11L), (1L, 2L, null.asInstanceOf[String], 12L))
      .toDF("k", "seq", "op", "v")
    val e3 = intercept[Exception] {
      operators.Relational.applyChangeLog(snap, nullOp, "k", "seq", "op").collect()
    }
    assert(e3.getMessage != null && e3.getMessage.contains("null op"),
      s"expected the null-op raise, got: ${e3.getMessage}")
  }

  test("decontaminate_embedding: threshold splits the population; flags track the max cosine") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Dedup.decontaminateEmbedding(spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Boolean]("contaminated") ==
          (r.getAs[Double]("max_eval_cos") >= 0.25))
        assert(r.getAs[Long]("vec_id") % 100 != 0, "eval probes must not be scored")
      }
      val flagged = rows.count(_.getAs[Boolean]("contaminated"))
      assert(flagged > 0 && flagged < rows.length,
        s"$dir: threshold degenerate ($flagged of ${rows.length})")
    }
  }

  test("bpeTrain: learned merge list matches a brute-force reference trainer") {
    // independent plain-Scala reimplementation of the loop: same tie rule
    // (count desc, then lexicographic (a, b)), same greedy-left fold
    val n = 6
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" "))
    var docs: Seq[Array[String]] = texts.toSeq
    val expected = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var go = true
    while (expected.size < n && go) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      docs.foreach(d => d.sliding(2).filter(_.length == 2).foreach { p =>
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + 1L
      })
      if (counts.isEmpty || counts.values.max < 2) go = false
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
        expected += ((a, b, c))
        val merged = a + "▁" + b
        docs = docs.map { d =>
          val acc = scala.collection.mutable.ArrayBuffer[String]()
          d.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b) {
              acc.remove(acc.size - 1); acc += merged
            } else acc += x
          }
          acc.toArray
        }
      }
    }
    val got = operators.TextAnalysis.bpeTrain(spark, sf, n)
    assert(got.nonEmpty && got == expected.toSeq,
      s"got $got\nexpected $expected")
    // counts at selection time must be non-increasing: each round merges
    // the then-most-frequent pair
    assert(got.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("quality_gopher: every rule fires somewhere, keep = conjunction, both branches populated") {
    // threshold materiality at both SFs: a rule that never rejects (or
    // never passes) is a constant, not a gate
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.TextAnalysis.qualityGopher(spark, dir).collect()
      assert(rows.nonEmpty)
      val rules = Seq("r_len", "r_wordlen", "r_diversity", "r_repetition")
      rules.foreach { r =>
        val vals = rows.map(_.getAs[Boolean](r)).toSet
        assert(vals == Set(true, false), s"$dir: rule $r is constant ($vals)")
      }
      rows.foreach { row =>
        val expect = rules.forall(row.getAs[Boolean](_))
        assert(row.getAs[Boolean]("keep") == expect,
          s"$dir: keep != conjunction for doc ${row.getAs[Long]("doc_id")}")
      }
      val kept = rows.count(_.getAs[Boolean]("keep"))
      assert(kept > 0 && kept < rows.length,
        s"$dir: gate is degenerate ($kept of ${rows.length} kept)")
    }
  }

  test("curriculum buckets partition the corpus with ordered boundaries") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.TextAnalysis.curriculumBuckets(spark, dir).collect()
        .sortBy(_.getAs[Int]("bucket"))
      assert(rows.map(_.getAs[Int]("bucket")).toSeq == Seq(1, 2, 3, 4),
        s"$dir: quartile bucketing must populate all four buckets")
      val total = rows.map(_.getAs[Long]("n_docs")).sum
      assert(total == Tables.documents(spark, dir).count(),
        s"$dir: buckets must partition the corpus (got $total docs)")
      // boundaries are ordered: no doc in a lower bucket is longer than
      // any doc in a higher one (quantile-threshold assignment)
      rows.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo.getAs[Long]("max_tokens") <= hi.getAs[Long]("min_tokens"),
          s"$dir: bucket ${lo.getAs[Int]("bucket")} max " +
            s"${lo.getAs[Long]("max_tokens")} > next min ${hi.getAs[Long]("min_tokens")}")
      }
    }
  }

  test("selection report: one row per doc, every signal column carries both regimes") {
    val rows = operators.Scoring.selectionReport(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    // signal diversity: the report is only useful if each joined family
    // actually discriminates on the fixture
    assert(rows.map(_.getAs[Boolean]("keep_dsir")).toSet == Set(true, false))
    assert(rows.exists(_.getAs[Long]("cluster_size") > 1) &&
      rows.exists(_.getAs[Long]("cluster_size") == 1))
    assert(rows.map(_.getAs[Long]("quality_bp")).distinct.length > 1)
    // soft weight is exactly 1/cluster_size at 6 dp
    rows.foreach { r =>
      val expect = BigDecimal(1.0 / r.getAs[Long]("cluster_size"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("doc_weight") == expect)
    }
  }

  test("dedup keep-best: kept member maximizes quality, and differs from keep-first somewhere") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val quality = operators.TextAnalysis.textQuality(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("quality_bp")).toMap
      val clusters = operators.Dedup.dedupClusters(spark, dir).collect()
        .map(r => r.getAs[Long]("cluster_id")).toSet
      val rows = operators.Dedup.dedupKeepBest(spark, dir).collect()
      assert(rows.map(_.getAs[Long]("cluster_id")).toSet == clusters,
        s"$dir: keep-best must cover exactly the multi-doc clusters")
      rows.foreach { r =>
        assert(r.getAs[Long]("kept_quality_bp") ==
          quality(r.getAs[Long]("kept_doc_id")),
          s"$dir: kept quality must be the kept member's quality")
        assert(r.getAs[Long]("kept_quality_bp") >= r.getAs[Long]("min_quality_bp"))
      }
      // materiality: keep-first (min doc_id = the cluster label) would
      // have kept a WORSE copy in at least one cluster
      assert(rows.exists(r =>
        r.getAs[Long]("kept_doc_id") != r.getAs[Long]("cluster_id")),
        s"$dir: keep-best never disagrees with keep-first — operator is vacuous here")
    }
  }

  test("shard assignment: dense per-shard positions, full coverage, bounded shards") {
    val rows = operators.TextAnalysis.shardAssignment(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.forall(s => s >= 0 && s < 8))
    // hash sharding at n=500 over 8 shards: every shard populated
    assert(byShard.size == 8, s"shards: ${byShard.keySet}")
    byShard.foreach { case (shard, docs) =>
      val ps = docs.map(_.getAs[Int]("pos")).sorted
      assert(ps.sameElements(1 to docs.length),
        s"shard $shard positions not dense: ${ps.take(5)}...")
    }
  }

  test("mixture temperature: shares normalize, boost is monotone against share") {
    val rows = operators.TextAnalysis.mixtureTemperature(spark, sf).collect()
    assert(rows.length > 1)
    val sumQ = rows.map(_.getAs[Double]("sample_share")).sum
    assert(math.abs(sumQ - 1.0) < 0.01, s"sample shares sum to $sumQ")
    // α < 1 compresses the distribution: smaller raw share → larger boost
    val byShare = rows.sortBy(_.getAs[Double]("share"))
    byShare.map(_.getAs[Double]("boost")).sliding(2).foreach {
      case Array(hi, lo) =>
        assert(hi >= lo - 1e-9, "boost must not increase with share")
      case _ =>
    }
  }

  test("quality gate is total: empty/NULL/degenerate text gets FALSE, never NULL, verdicts") {
    // the dropped-row class the dead-letter discipline exists to prevent: a
    // NULL verdict fails both filter(keep) and filter(!keep) and the row
    // vanishes from BOTH routes of the streaming gate
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val weird = Seq(
      (1L, ""), (2L, null.asInstanceOf[String]), (3L, " "),
      (4L, "a"), (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val v = operators.TextAnalysis.gopherVerdicts(weird).collect()
    assert(v.length == 5)
    v.foreach { r =>
      Seq("n_tokens", "mwl_c", "diversity_bp", "dup2_bp").foreach { m =>
        assert(!r.isNullAt(r.fieldIndex(m)),
          s"doc ${r.getAs[Long]("doc_id")}: metric $m is NULL") }
      Seq("r_len", "r_wordlen", "r_diversity", "r_repetition", "keep").foreach { b =>
        assert(!r.isNullAt(r.fieldIndex(b)),
          s"doc ${r.getAs[Long]("doc_id")}: verdict $b is NULL") }
      assert(!r.getAs[Boolean]("keep"),
        s"doc ${r.getAs[Long]("doc_id")}: degenerate text passed the gate")
    }
    // the two routes partition the batch — nothing vanishes, nothing doubles
    val scored = operators.TextAnalysis.gopherVerdicts(weird)
    assert(scored.filter(col("keep")).count() +
      scored.filter(!col("keep")).count() == 5L)
  }

  test("ngram novelty: total over the corpus, bounded, both regimes populated") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.TextAnalysis.ngramNovelty(spark, dir).collect()
      assert(rows.length == Tables.documents(spark, dir).count(),
        s"$dir: novelty must emit one row per document (totality)")
      rows.foreach { r =>
        val (n, novel, bp) = (r.getAs[Long]("n_grams"),
          r.getAs[Long]("novel_grams"), r.getAs[Long]("novelty_bp"))
        assert(novel >= 0 && novel <= n, s"$dir: novel_grams $novel outside [0, $n]")
        assert(bp >= 0 && bp <= 10000, s"$dir: novelty_bp $bp outside [0, 10000]")
      }
      // materiality: the signal discriminates on the fixture — template
      // mass at zero AND unique content above it
      assert(rows.exists(_.getAs[Long]("novelty_bp") == 0), s"$dir: no zero-novelty docs")
      assert(rows.exists(_.getAs[Long]("novelty_bp") > 0), s"$dir: no novel docs")
    }
  }

  test("collocations: top-k by PMI matches a brute-force count over the corpus") {
    import operators.TextAnalysis.{PmiMinCount, PmiTopK}
    val got = operators.TextAnalysis.collocationsPmi(spark, sf).collect()
      .map(r => (r.getAs[String]("bg"), r.getAs[Long]("cnt"), r.getAs[Double]("pmi")))
    assert(got.length == PmiTopK)
    got.foreach { case (_, cnt, _) => assert(cnt >= PmiMinCount) }
    // brute force: adjacent-pair counts + contingency marginals in Scala
    val texts = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val pairs = texts.flatMap(t => t.split(" ").sliding(2).withFilter(_.length == 2)
      .map(a => (a(0), a(1))))
    val cxy = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cx = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cy = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = pairs.length.toLong
    val expect = cxy.toSeq.filter(_._2 >= PmiMinCount)
      .map { case ((x, y), c) =>
        val pmi = BigDecimal(math.log(n.toDouble * c / (cx(x) * cy(y))))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (s"$x $y", c, pmi)
      }
      .sortBy { case (bg, _, pmi) => (-pmi, bg) }
      .take(PmiTopK)
    assert(got.toSeq == expect,
      s"got:\n${got.mkString("\n")}\nexpected:\n${expect.mkString("\n")}")
  }

  test("span bloom screen: no false negatives, measured false-positive rate is sane") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val flags = operators.Dedup.spanBloomFlags(spark, dir).cache()
      try {
        val exact = flags.filter(col("exact_hit")).count()
        val missed = flags.filter(col("exact_hit") && !col("bloom_hit")).count()
        val flagged = flags.filter(col("bloom_hit")).count()
        val clean = flags.filter(!col("exact_hit")).count()
        val fp = flags.filter(!col("exact_hit") && col("bloom_hit")).count()
        assert(exact > 0, s"$dir: fixture must carry cross-batch duplicate spans")
        assert(clean > 0, s"$dir: fixture must carry novel spans")
        assert(missed == 0, s"$dir: bloom filter dropped $missed true duplicates")
        assert(flagged >= exact, s"$dir: flagged $flagged < exact $exact")
        // ~8 bits/item sizing → ~2% theoretical fp; 20% is the loud-failure bound
        assert(fp * 5 <= clean, s"$dir: false-positive rate ${fp}/${clean} above 20%")
      } finally flags.unpersist()
      // and the oracle-facing rollup carries the verdict everywhere
      val rolled = operators.Dedup.dedupSpanBloom(spark, dir).collect()
      assert(rolled.forall(_.getAs[Boolean]("bloom_covers_exact")))
      assert(rolled.exists(_.getAs[Long]("n_exact_dup") > 0) &&
        rolled.exists(_.getAs[Long]("n_exact_dup") == 0),
        s"$dir: both screen branches must be populated")
    }
  }

  test("semdedup: dropped set equals the brute-force keep rule; both branches populated") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val flags = operators.Similarity.semdedupFlags(spark, dir).collect()
      val dropped = flags.filter(_.getAs[Boolean]("dropped"))
        .map(_.getAs[Long]("vec_id")).toSet
      val kept = flags.filterNot(_.getAs[Boolean]("dropped"))
        .map(_.getAs[Long]("vec_id")).toSet
      assert(dropped.nonEmpty && kept.nonEmpty,
        s"$dir: semantic prune must both keep and drop on the fixture")
      assert(dropped.size + kept.size == flags.length)
      // brute force: same-cell pairs at rounded cosine >= 0.4 drop their
      // (csim, vec_id)-max member — recomputed from scratch in Scala
      val vecs = flags.map { r =>
        (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray,
          r.getAs[Double]("nrm"), r.getAs[Int]("cell"), r.getAs[Double]("csim"))
      }
      val expectDropped = (for {
        (ia, ea, na, ca, sa) <- vecs.iterator
        (ib, eb, nb, cb, sb) <- vecs.iterator
        if ia < ib && ca == cb
        cos = BigDecimal(ea.zip(eb).map { case (x, y) => x.toDouble * y }.sum / (na * nb))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if cos >= 0.4
      } yield if (sa > sb || (sa == sb && ia > ib)) ia else ib).toSet
      assert(dropped == expectDropped,
        s"$dir: dropped mismatch — engine-only: ${(dropped -- expectDropped).take(5)}, " +
          s"brute-only: ${(expectDropped -- dropped).take(5)}")
    }
  }

  test("shard mix audit: all shards present, totals conserve, TV bounded and nonzero") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.TextAnalysis.shardMixAudit(spark, dir).collect()
        .sortBy(_.getAs[Long]("shard"))
      assert(rows.map(_.getAs[Long]("shard")).toSeq ==
        (0L until operators.TextAnalysis.ShardCount.toLong),
        s"$dir: every shard must appear")
      assert(rows.map(_.getAs[Long]("n_docs")).sum ==
        Tables.documents(spark, dir).count(), s"$dir: shards must partition the corpus")
      rows.foreach { r =>
        val tv = r.getAs[Long]("tv_bp")
        // TV in [0, 10000); identically-zero TV would mean the audit is
        // comparing a shard against itself
        assert(tv >= 0 && tv < 10000, s"$dir: tv_bp $tv out of range")
      }
      assert(rows.exists(_.getAs[Long]("tv_bp") > 0),
        s"$dir: hashed shards of a finite corpus cannot all match the global mixture exactly")
      // agreement with the assignment query's shard populations
      val fromAssign = operators.TextAnalysis.shardAssignment(spark, dir).collect()
        .groupBy(_.getAs[Long]("shard")).view.mapValues(_.length.toLong).toMap
      rows.foreach(r => assert(
        fromAssign(r.getAs[Long]("shard")) == r.getAs[Long]("n_docs"),
        s"$dir: audit and assignment disagree on shard ${r.getAs[Long]("shard")}"))
    }
  }

  test("media chunk dedup: shared mass matches a brute-force hash count") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Multimodal.multimodalChunkDedup(spark, dir).collect()
      assert(rows.exists(_.getAs[Long]("shared_chunks") > 0) &&
        rows.exists(_.getAs[Long]("shared_chunks") == 0),
        s"$dir: both shared and unique payload regimes must be populated")
      // brute force on the raw text payloads
      val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val allChunks = texts.flatMap { case (id, t) =>
        t.grouped(256).map(c => (id, c)) }
      val occ = allChunks.groupBy(_._2).view.mapValues(_.length).toMap
      val expect = allChunks.groupBy(_._1).view.mapValues { cs =>
        (cs.length.toLong, cs.count(c => occ(c._2) > 1).toLong,
          cs.filter(c => occ(c._2) > 1).map(_._2.length.toLong).sum)
      }.toMap
      rows.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val got = (r.getAs[Long]("n_chunks"), r.getAs[Long]("shared_chunks"),
          r.getAs[Long]("shared_bytes"))
        assert(got == expect(id), s"$dir doc $id: got $got expected ${expect(id)}")
      }
    }
  }

  test("epoch budget: allocation tracks the budget, epochs and repeats are consistent") {
    import operators.TextAnalysis.EpochBudgetTokens
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.TextAnalysis.epochBudget(spark, dir).collect()
      assert(rows.nonEmpty)
      val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
      assert(math.abs(alloc - EpochBudgetTokens) <= EpochBudgetTokens / 100,
        s"$dir: allocated $alloc drifts >1% from the $EpochBudgetTokens budget")
      rows.foreach { r =>
        val (n, a, e, rep) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("alloc_tokens"),
          r.getAs[Double]("epochs"), r.getAs[Long]("n_repeats"))
        assert(math.abs(e - a.toDouble / n) < 1e-3, s"$dir: epochs $e != $a/$n")
        assert(rep == math.ceil(e).toLong, s"$dir: n_repeats $rep != ceil($e)")
      }
    }
  }

  test("source profile: ordered quartiles, corpus partition") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.TextAnalysis.sourceProfile(spark, dir).collect()
      assert(rows.map(_.getAs[Long]("n_docs")).sum ==
        Tables.documents(spark, dir).count())
      rows.foreach { r =>
        val (p25, p50, p75, mx) = (r.getAs[Double]("p25_tokens"),
          r.getAs[Double]("p50_tokens"), r.getAs[Double]("p75_tokens"),
          r.getAs[Long]("max_tokens"))
        assert(p25 <= p50 && p50 <= p75 && p75 <= mx,
          s"$dir ${r.getString(0)}: quartiles out of order ($p25, $p50, $p75, $mx)")
      }
    }
  }

  test("split gram overlap: three pairs, bounded jaccard, the naive split leaks") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Dedup.splitGramOverlap(spark, dir).collect()
      assert(rows.length == 3, s"$dir: want the 3 unordered split pairs")
      rows.foreach { r =>
        val (a, b, sharedG) = (r.getAs[Long]("grams_a"), r.getAs[Long]("grams_b"),
          r.getAs[Long]("shared_grams"))
        assert(sharedG <= math.min(a, b), s"$dir: intersection exceeds a side")
        val j = r.getAs[Long]("jaccard_bp")
        assert(j >= 0 && j <= 10000)
      }
      // the audit's reason to exist: the naive split shares gram mass
      // between train and eval on this template-heavy fixture
      assert(rows.exists(_.getAs[Long]("shared_grams") > 0),
        s"$dir: expected lexical leakage across the naive split")
    }
  }

  test("hard negatives: two per anchor, margins non-negative, positive outranks") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Similarity.hardNegatives(spark, dir).collect()
      val byAnchor = rows.groupBy(_.getAs[Long]("qid"))
      assert(byAnchor.nonEmpty)
      byAnchor.foreach { case (qid, rs) =>
        assert(rs.length == 2, s"$dir anchor $qid: want ranks 2 and 3")
        assert(rs.map(_.getAs[Int]("neg_rank")).sorted.toSeq == Seq(2, 3))
        rs.foreach { r =>
          assert(r.getAs[Double]("pos_cos") >= r.getAs[Double]("neg_cos"),
            s"$dir anchor $qid: positive must outrank the hard negative")
          assert(r.getAs[Double]("margin") >= 0)
          assert(r.getAs[Long]("pos_id") != r.getAs[Long]("neg_id"))
        }
      }
      // materiality: some triplet must have a real margin to learn from
      assert(rows.exists(_.getAs[Double]("margin") > 0), s"$dir: all margins zero")
    }
  }

  test("pack efficiency agrees with pack_sequences and reports real boundary crossings") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val eff = operators.Packing.packEfficiency(spark, dir).collect()
        .map(r => r.getAs[Long]("bin_id") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("n_crossing"), r.getAs[Long]("overflow_toks"))).toMap
      val pack = operators.Packing.packSequences(spark, dir).collect()
        .map(r => r.getAs[Long]("bin_id") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
      assert(eff.keySet == pack.keySet, s"$dir: bin sets differ")
      eff.foreach { case (bin, (d0, t, c, o)) =>
        assert((d0, t) == pack(bin), s"$dir bin $bin: doc/token counts differ")
        assert(c <= d0, s"$dir bin $bin: more crossings than docs")
        assert(o == math.max(0L, t - operators.Packing.PackBudget),
          s"$dir bin $bin: overflow inconsistent")
      }
      assert(eff.values.exists(_._3 > 0),
        s"$dir: concat-then-chunk must produce boundary crossings on this corpus")
    }
  }

  test("padding waste curve: brute-force agreement, waste non-increasing in bucket count") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Packing.paddingWasteCurve(spark, dir).collect()
        .map(r => (r.getAs[Int]("n_buckets"), r.getAs[Long]("padded_tokens"),
          r.getAs[Long]("real_tokens"), r.getAs[Long]("waste_tokens"),
          r.getAs[Long]("waste_bp")))
      assert(rows.map(_._1).toSeq == operators.Packing.PaddingBucketCounts)
      // plain-Scala recompute with the same 4-dp interpolated quantiles
      val ns = Tables.documents(spark, dir)
        .select(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ").as("w"))
        .collect().map(_.getAs[Seq[String]]("w").size.toLong).sorted
      def quantile(p: Double): Double = {
        val idx = p * (ns.length - 1)
        val lo = idx.toInt; val frac = idx - lo
        val v =
          if (lo + 1 < ns.length) ns(lo) + frac * (ns(lo + 1) - ns(lo))
          else ns(lo).toDouble
        BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      rows.foreach { case (b, padded, real, waste, bp) =>
        val thr = (1 until b).map(i => quantile(i.toDouble / b))
        val byBucket = ns.groupBy(n => 1 + thr.count(n > _))
        val wantPadded = byBucket.values.map(g => g.length.toLong * g.max).sum
        val wantReal = ns.sum
        assert(padded == wantPadded && real == wantReal,
          s"$dir B=$b: got ($padded,$real) want ($wantPadded,$wantReal)")
        assert(waste == padded - real && bp == waste * 10000 / math.max(padded, 1L))
      }
      // nested quantile boundaries => refining buckets => monotone waste
      rows.sliding(2).foreach { case Array(a, c) =>
        assert(c._4 <= a._4,
          s"$dir: waste must not increase ${a._1}->${c._1} buckets (${a._4} -> ${c._4})")
      }
      // materiality: bucketing must actually help on this corpus
      assert(rows.last._4 < rows.head._4,
        s"$dir: 8 buckets must beat 1 bucket (${rows.head._4} -> ${rows.last._4})")
    }
  }

  test("gate rule matrix: symmetric, diagonal-dominant, diagonal equals the gate's failures") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val cells = operators.TextAnalysis.gateRuleMatrix(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_both_fail"))
        .toMap
      assert(cells.size == 16, s"$dir: want the full 4x4 matrix")
      cells.foreach { case ((a, b), n) =>
        assert(cells((b, a)) == n, s"$dir: matrix not symmetric at ($a,$b)")
        assert(n <= math.min(cells((a, a)), cells((b, b))),
          s"$dir: intersection ($a,$b)=$n exceeds a diagonal")
      }
      val verdicts = operators.TextAnalysis.gopherVerdicts(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      Seq("r_len", "r_wordlen", "r_diversity", "r_repetition").foreach { rule =>
        assert(cells((rule, rule)) == verdicts.filter(!col(rule)).count(),
          s"$dir: diagonal of $rule differs from the gate's failure count")
      }
    }
  }

  test("span provenance: hot spans only, consistent counts, syndication present") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Dedup.spanProvenance(spark, dir).collect()
      assert(rows.nonEmpty, s"$dir: the template-heavy fixture must carry hot spans")
      rows.foreach { r =>
        val (occ, nd, ns) = (r.getAs[Long]("n_occurrences"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"))
        assert(occ >= operators.Dedup.SpanHotThreshold)
        assert(nd <= occ && ns <= nd, s"$dir: inconsistent counts ($occ, $nd, $ns)")
      }
      assert(rows.exists(_.getAs[Long]("n_sources") > 1),
        s"$dir: expected at least one syndicated (multi-source) hot span")
    }
  }

  test("lm-quality calibration partitions the scored corpus into balanced quartiles") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = operators.Scoring.lmQualityCalibration(spark, dir).collect()
        .sortBy(_.getAs[Int]("bucket"))
      assert(rows.map(_.getAs[Int]("bucket")).toSeq == Seq(1, 2, 3, 4),
        s"$dir: all four quartile buckets must be populated")
      val scored = operators.Scoring.lmPerplexity(spark, dir)
        .filter(col("n_bigrams").isNotNull).count()
      val total = rows.map(_.getAs[Long]("n_docs")).sum
      assert(total == scored, s"$dir: buckets must partition the scored docs")
      // quartile assignment: no bucket more than twice the even share
      // (ties can shift membership, gross skew means broken thresholds)
      rows.foreach(r => assert(r.getAs[Long]("n_docs") * 2 <= scored,
        s"$dir: bucket ${r.getAs[Int]("bucket")} holds over half the corpus"))
      // score ranges are ordered across buckets
      rows.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo.getAs[Double]("max_avg_logp") <= hi.getAs[Double]("min_avg_logp"),
          s"$dir: bucket ranges overlap")
      }
    }
  }
}
