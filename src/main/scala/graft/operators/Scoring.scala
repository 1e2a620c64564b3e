package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Corpus scoring & selection — the "which documents do we train on"
  * battery of a pretraining-data pipeline, complementing the dedup family
  * (which asks "which documents are copies") and the quality battery in
  * [[TextAnalysis]] (surface heuristics). All three operators here score
  * documents against corpus-level statistics that are themselves computed
  * distributively, so the pattern is always: one tokenize pass → small
  * statistics relation → broadcast/join back → per-doc aggregate.
  *
  * Reference context: the reference pipeline (Demo1/Demo2) stops at
  * parse/window/count; these operators are the north-star extension the
  * build plan (SURVEY.md §7.2 round 9) assigns to the LLM-pipeline
  * surface, with DuckDB oracles like every other batch query.
  */
object Scoring {

  // ------------------------------------------------- n-gram LM perplexity
  /** Bigram-LM perplexity scoring (the CCNet/KenLM-style quality filter):
    * train add-k-smoothed bigram statistics on the corpus itself, then
    * score every document by its average bigram log-probability and
    * perplexity. Lower perplexity = more "corpus-typical" text; a
    * pretraining pipeline thresholds or buckets on this to drop
    * gibberish and boilerplate.
    *
    *   P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V),  k = 0.5,
    *   V = corpus distinct-unigram count,
    *   avg_logp(doc) = Σ m(bg)·ln P(bg) / Σ m(bg),  ppl = e^(−avg_logp).
    *
    * Shape at scale (rebuilt, VERDICT r15 item 3 — the old plan
    * repartitioned the full token arrays, checkpointed a corpus-sized tf
    * frame to disk, and let the model joins shuffle; it was the slowest
    * measured family at ×1000): scoring runs over raw bigram OCCURRENCES
    * ([[bigramOccurrences]] — per-doc distinct counting is mathematically
    * redundant for a weighted average, so nothing is counted before the
    * model joins), the only materialized intermediate is the
    * VOCABULARY-sized c2 aggregate (localCheckpoint'd; c1 and the
    * broadcast decision both read it — map-side combine compresses each
    * partition to the vocabulary before its exchange), and the model
    * relations are explicitly broadcast when they fit under
    * [[LmModelBroadcastRows]] — so scoring is one scan-backed explode
    * through two broadcast hash joins into a doc_id partial aggregate
    * whose exchange carries ONE row per doc (each doc's occurrence rows
    * never leave their scan partition before the partial agg).
    * Scores are rounded to 4 dp (ln agreement at that precision is the
    * established [[TextAnalysis.textTfidf]] contract); ppl is derived
    * from the UNROUNDED average, rounded to 2 dp.
    */
  def lmPerplexity(s: SparkSession, d: String): DataFrame =
    lmPerDoc(s, d).orderBy("doc_id")

  /** The UNORDERED per-document LM-score frame backing [[lmPerplexity]]
    * (which adds the presentation sort) and [[lmQualityCalibration]]
    * (which aggregates it) — one training + scoring definition for both
    * consumers. */
  private def lmPerDoc(s: SparkSession, d: String): DataFrame = {
    Tables.tuneSession(s) // shingle arrays get exploded
    // tf is re-derived per consumer (training aggregate + scoring pass):
    // one scan + explode is cheaper at every measured scale than
    // materializing the corpus-sized tf frame to disk. parallelizeIfLarge
    // spreads the scan (fixture tables are few large part files — a
    // single 76 MB part reads as ONE partition and serializes the whole
    // tokenize+explode on one core; the old plan's repartition(doc_id)
    // was incidentally paying for this parallelism)
    def tf: DataFrame = bigramOccurrences(Tables.parallelizeIfLarge(s,
      Tables.documents(s, d).select(col("doc_id"), col("text"))))
    // the broadcast-decision row count rides the checkpoint job as an
    // observed metric (r17 — the clusterLabels pattern): the separate
    // count job re-read the checkpointed model frame once per invocation
    val c2obs = org.apache.spark.sql.Observation()
    val c2 = tf.groupBy("bg").agg(sum("m").as("c2"))
      .observe(c2obs, count(lit(1)).as("n"))
      .localCheckpoint() // vocabulary-sized; read by c1 and the join
    val c1 = c2.groupBy(substring_index(col("bg"), " ", 1).as("pre"))
      .agg(sum("c2").as("c1"))
    val v = Tables.parallelizeIfLarge(s, Tables.documents(s, d).select(col("text")))
      .select(explode(array_distinct(Portable.tokens(col("text")))).as("t"))
      .agg(countDistinct("t").as("v"))
    // the broadcast decision is the observed vocabulary size: an explicit
    // hint, because a corpus-scale drill's model (~1M bigrams) sits above
    // the 10 MB auto-broadcast threshold yet far under executor memory —
    // exactly the join that must never shuffle the corpus-sized tf side
    val nModel = org.apache.spark.sql.GraftBridge.observedLong(c2obs, "n")(c2.count())
    val (jc2, jc1) =
      if (nModel <= LmModelBroadcastRows) (broadcast(c2), broadcast(c1))
      else (c2, c1)
    scoreAgainstLm(tf, jc2, jc1, v, Tables.documents(s, d).select(col("doc_id")))
  }

  /** Bigram-vocabulary bound under which the LM model relations are
    * explicitly broadcast by [[lmPerDoc]] (~2M rows ≈ low hundreds of MB
    * — comfortable for any executor this engine targets); a corpus whose
    * bigram vocabulary exceeds it falls back to Catalyst's own join
    * choice (shuffle join keyed on the n-gram). */
  private val LmModelBroadcastRows = 2000000L

  /** Per-doc bigram OCCURRENCE frame `(doc_id, bg, m = 1)` — the tf input
    * [[scoreAgainstLm]] consumes, with multiplicity left IMPLICIT: the
    * m-weighted average over distinct bigrams (Σ m·logp / Σ m) equals the
    * plain average over raw occurrences, so per-doc distinct counting —
    * which either shuffles the corpus (the old `groupBy(doc_id, bg)`
    * behind a token-array repartition plus a corpus-sized tf checkpoint)
    * or runs interpreted per-element lambdas (an in-row run-length
    * attempt this replaced: higher-order-function sort/filter/transform
    * measured 25 s alone at ×100, losing to Tungsten's codegen hash
    * aggregation it displaced) — is pure waste. One explode, no counting,
    * no exchange: occurrences flow straight from the scan partition
    * through the broadcast model joins into the doc_id partial aggregate.
    * Consumers that need true per-bigram counts (c2) aggregate this frame
    * by bg, where map-side combine compresses each partition to the
    * vocabulary before anything shuffles. */
  private[graft] def bigramOccurrences(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(Portable.shingles(Portable.tokens(col("text")), 2)).as("bg"),
      lit(1L).as("m"))

  /** THE definition of the LM scoring composition — one copy of the
    * formula (k = 0.5 add-k smoothing, weighted average, 4 dp/2 dp
    * rounding) shared by [[lmPerplexity]] and [[lmScoreBatch]], so a
    * smoothing or rounding change can never drift between the in-corpus
    * query and the serving path. Left joins + coalesce are
    * value-identical to inner joins when every n-gram is in-model (the
    * in-corpus case) and are the OOV generalization when it is not.
    * Output is UNORDERED — the oracle-facing entry adds its
    * presentation sort; the serving/streaming paths must not pay a
    * per-batch range exchange for an order no consumer reads.
    */
  private def scoreAgainstLm(tf: DataFrame, c2: DataFrame, c1: DataFrame,
      v: DataFrame, docIds: DataFrame): DataFrame = {
    val scored = tf
      .join(c2, Seq("bg"), "left")
      .join(c1, substring_index(tf("bg"), " ", 1) === c1("pre"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("m"),
        log((coalesce(col("c2"), lit(0L)) + lit(0.5)) /
          (coalesce(col("c1"), lit(0L)) + lit(0.5) * col("v"))).as("logp"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_bigrams"),
        (sum(col("m") * col("logp")) / sum("m")).as("avg_logp"))
    docIds
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        round(col("avg_logp"), 4).as("avg_logp"),
        round(exp(-col("avg_logp")), 2).as("ppl"))
  }

  /** The LM training + per-doc scoring CTE chain (ends with `agg`:
    * doc_id, n_bigrams, unrounded avg_logp) — one DuckDB copy shared by
    * [[lmPerplexitySql]] and [[lmQualityCalibrationSql]], mirroring the
    * [[lmPerDoc]] seam on the Spark side. */
  private val lmCtesSql: String = {
    val sh2 = Portable.shinglesSql(2)
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |bg AS (SELECT doc_id, unnest($sh2) AS bg FROM d),
       |tf AS (SELECT doc_id, bg, count(*) AS m FROM bg GROUP BY 1, 2),
       |c2 AS (SELECT bg, sum(m) AS c2 FROM tf GROUP BY 1),
       |c1 AS (SELECT split_part(bg, ' ', 1) AS pre, sum(c2) AS c1
       |       FROM c2 GROUP BY 1),
       |v AS (SELECT count(DISTINCT tok) AS v FROM
       |       (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
       |sc AS (SELECT tf.doc_id, tf.m,
       |         ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v)) AS logp
       |       FROM tf JOIN c2 USING (bg)
       |       JOIN c1 ON split_part(tf.bg, ' ', 1) = c1.pre CROSS JOIN v),
       |agg AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
       |          sum(m * logp) / sum(m) AS avg_logp
       |        FROM sc GROUP BY 1)""".stripMargin
  }

  val lmPerplexitySql: String =
    s"""WITH $lmCtesSql
       |SELECT docs.doc_id, agg.n_bigrams,
       |  round(agg.avg_logp, 4) AS avg_logp,
       |  round(exp(-agg.avg_logp), 2) AS ppl
       |FROM (SELECT doc_id FROM documents) docs LEFT JOIN agg USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------- perplexity × quality calibration
  /** LM-score × surface-quality calibration — the report that tells a
    * curation team whether the two independent selection signals AGREE
    * (CCNet buckets its corpus exactly this way: perplexity quartiles,
    * then per-bucket treatment): documents are bucketed by corpus
    * quartiles of their rounded avg bigram log-probability ([[lmPerDoc]],
    * the `lm_perplexity` score verbatim) and each bucket reports its doc
    * count, mean surface quality ([[TextAnalysis.qualityBpExpr]] verbatim
    * — integer basis points, integer-division mean, no rounding
    * semantics) and its score range. A monotone mean-quality trend across
    * buckets validates the LM filter; a flat one says the signals are
    * orthogonal and both earn their keep.
    *
    * Shape at scale: the quartile thresholds come from ONE `percentile`
    * aggregate over the per-doc score frame and buckets are a comparison
    * projection against the broadcast threshold row — the
    * `curriculum_buckets` pattern, deliberately NOT a global `ntile()`
    * window (which would total-sort the corpus). Thresholds and per-doc
    * scores are rounded to 4 dp on both engines BEFORE comparison so
    * bucket boundaries cannot float-drift. Documents with no bigrams
    * (NULL score) are excluded — they have no LM opinion to calibrate.
    */
  def lmQualityCalibration(s: SparkSession, d: String): DataFrame = {
    // Quartiles are interpolated over the INTEGERIZED score (rounded
    // 4-dp score × 10⁴ — an exact long, since the 4-dp values are the
    // established engine-agreed contract): interpolation over integers
    // yields exact multiples of 0.25, so thresholds need no rounding and
    // the bucket comparison has NO float-tie class at all. Interpolating
    // over the raw doubles instead put q25 on a round-4 tie at sf0.01
    // and moved one document across engines.
    val scored = lmPerDoc(s, d)
      .filter(col("n_bigrams").isNotNull)
      .select(col("doc_id"), col("avg_logp"),
        round(col("avg_logp") * 10000).cast("long").as("si"))
      // read TWICE (quartile aggregate + bucket join): without the
      // checkpoint the full LM train+score subtree plans — and partly
      // runs — twice per invocation (the sibling-scan discipline; this
      // is the costliest multi-consumer frame in the scoring family)
      .localCheckpoint()
    val quality = TextAnalysis.withQualityCounts(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextAnalysis.qualityBpExpr.as("quality_bp"))
    val q = scored.agg(
      expr("percentile(si, 0.25)").as("q25"),
      expr("percentile(si, 0.5)").as("q50"),
      expr("percentile(si, 0.75)").as("q75"))
    scored.join(quality, "doc_id")
      .crossJoin(broadcast(q))
      .select(col("quality_bp"), col("avg_logp"),
        (lit(1) + (col("si") > col("q25")).cast("int")
          + (col("si") > col("q50")).cast("int")
          + (col("si") > col("q75")).cast("int")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("quality_bp").as("sum_q"),
        min("avg_logp").as("min_avg_logp"), max("avg_logp").as("max_avg_logp"))
      .select(col("bucket"), col("n_docs"),
        expr("sum_q div n_docs").as("mean_quality_bp"),
        col("min_avg_logp"), col("max_avg_logp"))
      .orderBy("bucket")
  }

  val lmQualityCalibrationSql: String =
    s"""WITH $lmCtesSql,
       |lmr AS (SELECT doc_id, round(avg_logp, 4) AS avg_logp,
       |          CAST(round(round(avg_logp, 4) * 10000) AS BIGINT) AS si
       |        FROM agg),
       |qc AS (
       |  SELECT doc_id,
       |    len(string_split(text, ' ')) AS n,
       |    len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS nstop,
       |    len(list_distinct(string_split(text, ' '))) AS ndist
       |  FROM documents),
       |qt AS (SELECT doc_id,
       |    ${TextAnalysis.QualityBpSqlFrag} AS quality_bp FROM qc),
       |j AS (SELECT lmr.doc_id, lmr.avg_logp, lmr.si, qt.quality_bp
       |      FROM lmr JOIN qt USING (doc_id)),
       |thr AS (SELECT quantile_cont(CAST(si AS DOUBLE), 0.25) AS q25,
       |               quantile_cont(CAST(si AS DOUBLE), 0.5) AS q50,
       |               quantile_cont(CAST(si AS DOUBLE), 0.75) AS q75
       |        FROM j),
       |b AS (SELECT 1 + CAST(si > q25 AS INT) + CAST(si > q50 AS INT)
       |        + CAST(si > q75 AS INT) AS bucket,
       |        quality_bp, avg_logp
       |      FROM j CROSS JOIN thr)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(quality_bp) // count(*) AS BIGINT) AS mean_quality_bp,
       |  min(avg_logp) AS min_avg_logp, max(avg_logp) AS max_avg_logp
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // ------------------------------------------- persisted LM model serving
  /** Persist the trained bigram-LM statistics so scoring never re-trains —
    * the maintenance/serving split of [[lmPerplexity]], completing the
    * pattern set by `Similarity.writeAnnIndex` and
    * `Dedup.writeDedupIndex`: training is a multi-full-pass batch job
    * that runs ONCE; serving a probe batch reads only the model
    * artifacts and the probes.
    *
    * Artifacts under `dir`: `c2` (bigram counts), `c1` (context totals —
    * derived from the PERSISTED c2 so the two relations can never
    * drift), `meta` (one row: corpus distinct-unigram count V). At
    * 100 TB the model is vocabulary-bounded — orders of magnitude
    * smaller than the corpus — which is exactly why the training scan
    * must not be re-run per scoring batch.
    */
  def writeLmModel(s: SparkSession, d: String, dir: String): Unit = {
    graft.models.ModelManifest.invalidate(s, dir)
    Tables.tuneSession(s)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
    docs.select(explode(Portable.shingles(col("w"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
      .write.mode("overwrite").parquet(s"$dir/c2")
    s.read.parquet(s"$dir/c2")
      .groupBy(substring_index(col("bg"), " ", 1).as("pre"))
      .agg(sum("c2").as("c1"))
      .write.mode("overwrite").parquet(s"$dir/c1")
    docs.select(explode(col("w")).as("t"))
      .agg(countDistinct("t").as("v"))
      .write.mode("overwrite").parquet(s"$dir/meta")
    graft.models.ModelManifest.write(s, dir, "lm_bigram", d,
      Seq("documents"))
  }

  /** Score a probe batch `(doc_id, text)` against pre-trained LM
    * relations — the serving half. Same formula and output schema as
    * [[lmPerplexity]], with one generalization the in-corpus query never
    * needs: out-of-vocabulary n-grams. A bigram absent from c2 scores
    * (0+k)/(c1+kV); an unseen context scores k/(kV) = 1/V — both finite,
    * the add-k guarantee. Plan shape: probes tokenize once, model
    * relations are vocabulary-bounded joins (broadcast when they fit),
    * one doc_id-keyed aggregate; the corpus is never scanned. Output is
    * UNORDERED (the [[scoreAgainstLm]] contract): a per-micro-batch sink
    * must not pay a range exchange for presentation order.
    */
  def lmScoreBatch(probes: DataFrame, c2: DataFrame, c1: DataFrame,
      v: DataFrame): DataFrame = {
    Tables.tuneSession(probes.sparkSession)
    // same in-row counting as training ([[bigramOccurrences]]): a probe
    // batch pays no exchange before its doc_id partial aggregate
    scoreAgainstLm(bigramOccurrences(probes.select(col("doc_id"), col("text"))),
      c2, c1, v, probes.select(col("doc_id")))
  }

  /** Convenience serving entry: read the persisted model and score. */
  def lmScoreFromModel(s: SparkSession, modelDir: String,
      probes: DataFrame): DataFrame = {
    graft.models.ModelManifest.validate(s, modelDir, "lm_bigram")
    lmScoreBatch(probes,
      s.read.parquet(s"$modelDir/c2"),
      s.read.parquet(s"$modelDir/c1"),
      s.read.parquet(s"$modelDir/meta"))
  }

  // --------------------------------------------------------- BM25 top-k
  /** BM25-scored retrieval: rank the corpus against a fixed query-term
    * set and return the top 15 — the evaluation/retrieval primitive of a
    * data pipeline (finding near-query documents for decontamination or
    * RAG eval). Okapi BM25 with k1 = 1.2, b = 0.75 and
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Shape at scale: tokens are filtered to the query terms BEFORE any
    * aggregation, so the tf frame is |Q|-bounded per doc; df and the
    * (N, avgdl) statistics are single-row/|Q|-row broadcasts; the only
    * corpus-wide exchange is the doc_id-keyed partial count, and the
    * final top-k is a TakeOrderedAndProject (no global sort). Scores are
    * rounded to 4 dp BEFORE ranking so both engines agree at rank
    * boundaries; ties broken by doc_id.
    */
  def bm25Topk(s: SparkSession, d: String): DataFrame = {
    Tables.tuneSession(s) // token arrays get exploded
    val terms = Bm25Terms
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
    val stats = docs
      .agg(count(lit(1)).as("n_docs"),
        avg(size(col("w")).cast("double")).as("avgdl"))
    // tf is materialized once (it is |Q|-bounded per doc), so the df
    // branch reads the aggregate instead of re-scanning and re-tokenizing
    // the corpus — Catalyst plans sibling branches independently and would
    // otherwise run the scan+explode twice (the textTfidf pattern)
    val tf = docs
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      .localCheckpoint()
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    bm25ScoreTail(tf, df, stats)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(15)
  }

  /** THE definition of the Okapi BM25 scoring composition (k1 = 1.2,
    * b = 0.75, the idf and length-normalization formulas, 4 dp rounding)
    * — one copy shared by [[bm25Topk]] and the serving path
    * ([[bm25ScoreBatch]]), the [[scoreAgainstLm]]/[[dsirScoreTail]]
    * discipline: a formula or rounding change can never drift between
    * the in-corpus query and model serving. `df`/`stats` are
    * vocabulary-bounded/single-row broadcasts. The join on `term` is
    * INNER — a term with no df row (out-of-model vocabulary at serving
    * time) contributes nothing, which on the training corpus is
    * value-identical to the in-corpus query (every scored tf term is in
    * its own document, hence in-model). Output is UNORDERED (the
    * [[scoreAgainstLm]] contract); the oracle-facing entry adds its
    * presentation sort + limit.
    */
  private def bm25ScoreTail(tf: DataFrame, df: DataFrame,
      stats: DataFrame): DataFrame = {
    val k1 = 1.2; val b = 0.75
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + (col("dl") / col("avgdl") * b + (1.0 - b)) * k1))
          .as("contrib"))
      .groupBy("doc_id")
      .agg(round(sum("contrib"), 4).as("bm25"),
        count(lit(1)).as("n_terms"))
  }

  // ----------------------------------------- persisted BM25 model serving
  /** Persist the trained BM25 statistics — the maintenance/serving split
    * of [[bm25Topk]], completing the selector family (LM and DSIR got
    * their splits in round 9; BM25 was the last selector re-deriving
    * corpus statistics per invocation). Artifacts under `dir`:
    * `df` — per-term document frequency over the FULL corpus vocabulary
    * (|vocabulary|-bounded, so one model serves ANY query-term set, not
    * just [[Bm25Terms]]); `meta` — one row (n_docs, avgdl). At 100 TB
    * the corpus-statistics scan runs ONCE here; scoring a probe batch
    * or ranking against a new query never re-reads the corpus.
    */
  def writeBm25Model(s: SparkSession, d: String, dir: String): Unit = {
    graft.models.ModelManifest.invalidate(s, dir)
    Tables.tuneSession(s)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
    docs.select(explode(array_distinct(col("w"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/df")
    docs.agg(count(lit(1)).as("n_docs"),
        avg(size(col("w")).cast("double")).as("avgdl"))
      .write.mode("overwrite").parquet(s"$dir/meta")
    graft.models.ModelManifest.write(s, dir, "bm25", d, Seq("documents"))
  }

  /** Score a probe batch `(doc_id, text)` against pre-trained BM25
    * relations for a query-term set — the serving half. Same formula and
    * output schema as [[bm25Topk]]'s pre-sort frame, via the shared
    * [[bm25ScoreTail]]. Pinned OOV semantics: a query term absent from
    * the MODEL vocabulary has no df row and contributes nothing (inner
    * join); a probe document containing none of the query terms emits no
    * row (score 0 by absence — the [[bm25Topk]] convention). The model
    * df relation is pre-filtered to the query terms so the broadcast is
    * |Q| rows, not |vocabulary|. One probe tokenize, no corpus scan.
    * Output UNORDERED.
    */
  def bm25ScoreBatch(probes: DataFrame, df: DataFrame, stats: DataFrame,
      terms: Seq[String] = Bm25Terms): DataFrame = {
    Tables.tuneSession(probes.sparkSession)
    val w = Portable.tokens(col("text"))
    val tf = probes
      .select(col("doc_id"), size(w).cast("long").as("dl"),
        explode(w).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    bm25ScoreTail(tf, df.filter(col("term").isin(terms: _*)), stats)
  }

  /** Convenience serving entry: read the persisted model and score. */
  def bm25ScoreFromModel(s: SparkSession, modelDir: String,
      probes: DataFrame, terms: Seq[String] = Bm25Terms): DataFrame = {
    graft.models.ModelManifest.validate(s, modelDir, "bm25")
    bm25ScoreBatch(probes,
      s.read.parquet(s"$modelDir/df"),
      s.read.parquet(s"$modelDir/meta"), terms)
  }

  /** Fixed query-term set for [[bm25Topk]] (drawn from the fixture
    * vocabulary; any out-of-corpus term simply contributes df = 0 rows).
    */
  val Bm25Terms: Seq[String] = Seq("join", "vector", "stream")

  val bm25TopkSql: String = {
    // single quotes doubled on interpolation: the current terms are plain
    // tokens, but a data-driven term set must not be able to produce
    // malformed (or injectable) oracle SQL
    val lst = Bm25Terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |stats AS (SELECT count(*) AS n_docs,
       |            avg(CAST(len(w) AS DOUBLE)) AS avgdl FROM d),
       |toks AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
       |           unnest(w) AS term FROM d),
       |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
       |       FROM toks WHERE term IN ($lst) GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id,
       |         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
       |           (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
       |           AS contrib
       |       FROM tf JOIN df USING (term) CROSS JOIN stats)
       |SELECT doc_id, round(sum(contrib), 4) AS bm25,
       |  CAST(count(*) AS BIGINT) AS n_terms
       |FROM sc GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id ASC LIMIT 15""".stripMargin
  }

  // ----------------------------------------- DSIR importance weighting
  /** Hashed n-gram importance weights (the DSIR recipe — Data Selection
    * via Importance Resampling, Xie et al. 2023): estimate a target and a
    * raw unigram distribution over B hashed feature buckets, then weight
    * every document by its log importance ratio
    *
    *   log w(doc) = Σ_tokens [ ln p̂_target(bucket(tok)) −
    *                           ln p̂_raw(bucket(tok)) ],
    *
    * with add-1 smoothing: p̂(b) = (c(b)+1)/(n+B). The target slice here
    * is `lang = 'en'` (the fixture's majority class standing in for the
    * curated domain); `keep` flags docs whose tokens look more
    * target-like than corpus-like. Bucketing uses the engine-portable
    * [[Portable.hash28]] so the oracle reproduces the exact buckets.
    *
    * Shape at scale: ONE tokenize pass builds a (doc_id, bucket) partial
    * count; bucket statistics are a B-row aggregate (B = 256 — FIXED,
    * independent of corpus size, the whole point of feature hashing) and
    * their totals a single row, so the scoring join is always a
    * broadcast; the only corpus-wide exchange is the doc_id aggregate.
    * This is the distribution-matching selector that complements
    * [[lmPerplexity]] (fluency) and [[TextAnalysis.textQuality]]
    * (surface form).
    */
  def importanceWeights(s: SparkSession, d: String): DataFrame = {
    Tables.tuneSession(s) // token arrays get exploded
    val B = DsirBuckets
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(Portable.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"),
        (Portable.hash28(col("tok")) % B).as("bucket"))
    // (doc_id, bucket) partial counts — reused by doc scoring AND, via a
    // second aggregate, by the bucket/global statistics (one scan total)
    val docBuckets = toks
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("m"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("m_tgt"))
      .localCheckpoint()
    val buckets = docBuckets.groupBy("bucket")
      .agg(sum("m").as("c_raw"), sum("m_tgt").as("c_tgt"))
    val totals = buckets.agg(sum("c_raw").as("n_raw"), sum("c_tgt").as("n_tgt"))
    val ratios = buckets.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("c_tgt") + lit(1.0)) / (col("n_tgt") + lit(B.toDouble))) -
          log((col("c_raw") + lit(1.0)) / (col("n_raw") + lit(B.toDouble))))
          .as("lr"))
    dsirScoreTail(docBuckets, ratios).orderBy("doc_id")
  }

  /** Hashed-feature bucket count for the DSIR family — FIXED by design
    * (feature hashing's point): the model is B rows however big the
    * corpus. */
  val DsirBuckets: Int = 256

  /** THE definition of the DSIR scoring tail — one copy of the weighted
    * log-ratio sum and the rounded-keep rule, shared by
    * [[importanceWeights]] and the serving path ([[dsirScoreBatch]]).
    * keep derives from the ROUNDED weight: the sign of a raw double sum
    * near zero is summation-order noise both engines would hash-compare
    * as a boolean — the same instability the integer-verdict queries
    * engineered out. Output UNORDERED (the [[scoreAgainstLm]] contract).
    */
  private def dsirScoreTail(docBuckets: DataFrame, ratios: DataFrame): DataFrame =
    docBuckets.join(broadcast(ratios), "bucket")
      .groupBy("doc_id")
      .agg(sum("m").as("n_toks"),
        sum(col("m") * col("lr")).as("log_w"))
      .select(col("doc_id"), col("n_toks"),
        round(col("log_w"), 4).as("log_w"),
        (round(col("log_w"), 4) > 0).as("keep"))

  /** Persist the trained DSIR bucket log-ratios — the maintenance/serving
    * split of [[importanceWeights]], same contract as [[writeLmModel]]:
    * estimating the target and raw distributions is the corpus-scan job
    * and runs ONCE. The model is DENSE — all B = [[DsirBuckets]] rows,
    * not just corpus-observed buckets — so the serving join is total by
    * construction: a probe token the corpus never produced hashes to a
    * bucket whose ratio is the add-1 floor `ln((n_raw+B)/(n_tgt+B))`,
    * exactly what the smoothing formula assigns to zero-mass buckets.
    * B rows of `(bucket, lr)` parquet, always broadcast-sized.
    */
  def writeDsirModel(s: SparkSession, d: String, dir: String): Unit = {
    graft.models.ModelManifest.invalidate(s, dir)
    Tables.tuneSession(s)
    val B = DsirBuckets
    val observed = Tables.documents(s, d)
      .select(col("lang"), explode(Portable.tokens(col("text"))).as("tok"))
      .select(col("lang"), (Portable.hash28(col("tok")) % B).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_tgt"))
    val dense = s.range(B).select(col("id").as("bucket"))
      .join(observed, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("c_raw"), lit(0L)).as("c_raw"),
        coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
    val totals = dense.agg(sum("c_raw").as("n_raw"), sum("c_tgt").as("n_tgt"))
    dense.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("c_tgt") + lit(1.0)) / (col("n_tgt") + lit(B.toDouble))) -
          log((col("c_raw") + lit(1.0)) / (col("n_raw") + lit(B.toDouble))))
          .as("lr"))
      .write.mode("overwrite").parquet(s"$dir/ratios")
    graft.models.ModelManifest.write(s, dir, "dsir", d,
      Seq("documents"), Seq("buckets" -> B.toString))
  }

  /** Score a probe batch `(doc_id, text)` against pre-trained DSIR
    * ratios — the serving half. The dense model makes the join total
    * (every possible bucket 0..B−1 has a ratio row, OOV tokens included).
    * One probe tokenize, one broadcast join, one doc_id aggregate; the
    * corpus is never scanned. Output UNORDERED.
    */
  def dsirScoreBatch(probes: DataFrame, ratios: DataFrame): DataFrame = {
    Tables.tuneSession(probes.sparkSession)
    val tb = probes
      .select(col("doc_id"), explode(Portable.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), (Portable.hash28(col("tok")) % DsirBuckets).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("m"))
    dsirScoreTail(tb, ratios)
  }

  /** Convenience serving entry: read the persisted ratios and score. */
  def dsirScoreFromModel(s: SparkSession, modelDir: String,
      probes: DataFrame): DataFrame = {
    graft.models.ModelManifest.validate(s, modelDir, "dsir")
    dsirScoreBatch(probes, s.read.parquet(s"$modelDir/ratios"))
  }

  /** The DSIR per-doc scoring CTE chain (through `dsirsc(doc_id, n_toks,
    * log_w)`) — ONE SQL definition shared by [[importanceWeightsSql]] and
    * the selection-report oracle, so the bucket hashing and smoothing
    * cannot drift between the two. */
  private[operators] val dsirScoreSqlCtes: String = {
    val h = Portable.hash28Sql("tok")
    s"""dsirtoks AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |dsirtb AS (SELECT doc_id, lang, ($h % 256) AS bucket FROM dsirtoks),
       |dsirdb AS (SELECT doc_id, bucket, count(*) AS m,
       |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS m_tgt
       |       FROM dsirtb GROUP BY 1, 2),
       |dsirb AS (SELECT bucket, sum(m) AS c_raw, sum(m_tgt) AS c_tgt
       |      FROM dsirdb GROUP BY 1),
       |dsirt AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM dsirb),
       |dsirr AS (SELECT bucket,
       |        ln((c_tgt + 1.0) / (n_tgt + 256.0)) -
       |        ln((c_raw + 1.0) / (n_raw + 256.0)) AS lr
       |      FROM dsirb CROSS JOIN dsirt),
       |dsirsc AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_toks,
       |         sum(m * lr) AS log_w
       |       FROM dsirdb JOIN dsirr USING (bucket) GROUP BY 1)""".stripMargin
  }

  val importanceWeightsSql: String =
    s"""WITH $dsirScoreSqlCtes
       |SELECT doc_id, n_toks, round(log_w, 4) AS log_w,
       |  round(log_w, 4) > 0 AS keep
       |FROM dsirsc ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- selection report
  /** The per-document selection-signals table — the ONE materialized view
    * a curation run actually keeps: every document with its surface
    * quality score, its DSIR importance weight and keep verdict, and its
    * near-dup family size with the soft-dedup weight. Downstream
    * consumers (threshold sweeps, mixture planners, samplers) read this
    * instead of re-deriving any signal; it is the join of three
    * oracle-checked families, each through its shared seam
    * (`withQualityCounts`, `dsirScoreTail` via [[importanceWeights]],
    * `Dedup.docClusterSizes`), so no formula exists twice.
    *
    * Shape at scale: three per-doc relations, each one corpus scan (the
    * dedup leg's pair machinery is pair-density-sized), joined on
    * doc_id — co-partitioned shuffle joins, no driver state, output one
    * row per document.
    */
  def selectionReport(s: SparkSession, d: String): DataFrame = {
    val quality = TextAnalysis.withQualityCounts(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextAnalysis.qualityBpExpr.as("quality_bp"))
    val dsir = importanceWeights(s, d)
      .select(col("doc_id"), col("log_w"), col("keep").as("keep_dsir"))
    quality
      .join(dsir, Seq("doc_id"))
      .join(Dedup.docClusterSizes(s, d), Seq("doc_id"))
      .select(col("doc_id"), col("quality_bp"), col("log_w"), col("keep_dsir"),
        col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 6).as("doc_weight"))
      .orderBy("doc_id")
  }

  val selectionReportSql: String =
    s"""WITH RECURSIVE ${Dedup.pairsAndLabelsSqlCtes},
       |${Dedup.docClusterSizesSqlCtes},
       |$dsirScoreSqlCtes,
       |qm AS (
       |  SELECT doc_id,
       |    len(string_split(text, ' ')) AS n,
       |    len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS nstop,
       |    len(list_distinct(string_split(text, ' '))) AS ndist
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, CAST(${TextAnalysis.QualityBpSqlFrag} AS BIGINT)
       |    AS quality_bp FROM qm)
       |SELECT q.doc_id, q.quality_bp,
       |  round(sc.log_w, 4) AS log_w,
       |  round(sc.log_w, 4) > 0 AS keep_dsir,
       |  CAST(ds.cluster_size AS BIGINT) AS cluster_size,
       |  round(1.0 / ds.cluster_size, 6) AS doc_weight
       |FROM q
       |JOIN dsirsc sc ON q.doc_id = sc.doc_id
       |JOIN docsizes ds ON q.doc_id = ds.doc_id
       |ORDER BY q.doc_id""".stripMargin

  // ------------------------------------------------- quality classifier
  /** Distilled quality classifier — the fastText-pattern every large
    * pipeline runs (GPT-3's WebText classifier, LLaMA's quality filters,
    * DCLM): an expensive gate labels the corpus once, a CHEAP linear
    * model is trained to imitate it, and the model — not the gate — runs
    * at ingest scale. Here the teacher is the oracle-checked
    * `quality_gopher` gate; the student is logistic regression on the
    * gate's four surface metrics (log token count, mean word length,
    * diversity, duplicate-bigram mass), trained by full-batch gradient
    * descent with the weights on the driver (5 doubles — the bounded
    * codebook class, like the k-means codebook and the BPE merge list).
    * Each iteration is ONE aggregate over a standardized feature frame
    * that was localCheckpoint'd once; nothing per-row ever reaches the
    * driver. A linear boundary cannot represent the gate's AND-of-boxes
    * exactly, so training accuracy is a real measurement, not 100% by
    * construction.
    */
  val QcIters = 8
  private val QcDim = 8 // 4 raw metrics + their squares
  private val QcRidge = 1e-6
  private val QcAccuracyFloorPct = 80L

  /** Feature/label projection shared by training and serving — one
    * definition of the feature scaling on top of the gate's metric seam
    * (`TextAnalysis.gopherVerdicts`), so the student can never see
    * different features than its teacher's metrics. Squared terms are
    * included because two of the teacher's rules are two-sided BANDS
    * (token count, mean word length) — a purely linear boundary cannot
    * represent a band and plateaus at ~62% on the fixtures; the
    * quadratic expansion reaches ~95%. */
  private def qcFeatures(docs: DataFrame): DataFrame =
    TextAnalysis.gopherVerdicts(docs)
      .select(col("doc_id"),
        log(col("n_tokens") + lit(1.0)).as("x1"),
        (col("mwl_c") / 100.0).as("x2"),
        (col("diversity_bp") / 10000.0).as("x3"),
        (col("dup2_bp") / 10000.0).as("x4"),
        col("keep").cast("int").cast("double").as("y"))
      .select(col("*"),
        (col("x1") * col("x1")).as("x5"), (col("x2") * col("x2")).as("x6"),
        (col("x3") * col("x3")).as("x7"), (col("x4") * col("x4")).as("x8"))

  /** Train the logistic model by distributed IRLS (Newton steps): each of
    * the [[QcIters]] iterations is ONE aggregate over the standardized
    * frame producing the gradient (d+1 values) and the upper triangle of
    * the Hessian X·S·Xᵀ ((d+1)(d+2)/2 values, d = [[QcDim]]) — 54 sum
    * expressions in one codegen pass — and the driver solves the
    * (d+1)×(d+1) ridge-damped system by Gaussian elimination. Weights,
    * gradient, Hessian are all O(d²) driver state (the bounded-codebook
    * class); per-row data never leaves the executors. Newton converges
    * where first-order GD needed ~1000 corpus passes (measured) —
    * at 100 TB the difference is the whole feasibility of training.
    * Returns (weights [bias ∥ w₁..w_d], feature means, feature stds). */
  private def trainQc(feats: DataFrame): (Array[Double], Array[Double], Array[Double]) = {
    // AQE is scoped OFF for the training loop (restored in the finally):
    // every iteration is one global aggregate to a single row — no join
    // to re-strategize, no skew to split, nothing to coalesce — so
    // adaptive execution contributes only its per-stage materialization
    // job and re-planning pass, once per Newton iteration at EVERY scale
    // (driver latency, not data work). Measured locally: warm
    // quality_classifier 3.03 → 2.32 s with AQE off for the loop. The
    // rest of the query (the audit aggregate) keeps the session default.
    val sess = feats.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeBefore = sess.conf.get(aqeKey)
    sess.conf.set(aqeKey, "false")
    try trainQcLoop(feats)
    finally sess.conf.set(aqeKey, aqeBefore)
  }

  private def trainQcLoop(feats: DataFrame): (Array[Double], Array[Double], Array[Double]) = {
    val xs = (1 to QcDim).map(i => s"x$i")
    val statExprs = xs.flatMap(x => Seq(
      avg(x).as(s"m_$x"), coalesce(stddev_pop(x), lit(0.0)).as(s"s_$x")))
    val st = feats.agg(statExprs.head, statExprs.tail: _*).collect()(0)
    val mu = Array.tabulate(QcDim)(i => st.getDouble(2 * i))
    val sd = Array.tabulate(QcDim)(i => st.getDouble(2 * i + 1))
      .map(v => if (v > 0) v else 1.0)
    // standardization is FOLDED into the iteration projection (mu/sd are
    // fixed after the stats pass, so the z-subtree's codegen source is
    // identical every iteration) instead of materializing a second
    // checkpointed frame: the arithmetic re-runs per pass but is a
    // pipelined projection over the feats checkpoint — one less
    // full-frame materialization per training run at every scale (r17)
    val z = feats.select(col("y") +:
        (0 until QcDim).map(i =>
          ((col(s"x${i + 1}") - mu(i)) / sd(i)).as(s"z${i + 1}")): _*)
    val d1 = QcDim + 1
    var w = Array.fill(d1)(0.0)
    var iter = 0
    var converged = false
    while (iter < QcIters && !converged) {
      // the sigmoid is projected ONCE per row into (diff, s) and the 54
      // aggregate expressions touch only those two columns — inlining the
      // sigmoid string into every aggregate made each iteration's codegen
      // compile a 55-fold copy of it (measured: the compile time, not the
      // 5000-row pass, dominated the query).
      // The weights enter as ONE array literal read by element_at, not as
      // inlined double literals: an ArrayType literal becomes a codegen
      // REFERENCE object, so every iteration's generated source is
      // byte-identical and the janino compile is paid once per session —
      // the r17 JobProfile measured the per-iteration recompile (distinct
      // inlined literals per iteration) as the dominant driver-side gap
      // of this query (guide §1.2 per-task work).
      val warr = typedlit(w.toSeq)
      val lin = (0 until d1).map(i =>
        if (i == 0) element_at(warr, 1)
        else element_at(warr, i + 1) * col(s"z$i")).reduce(_ + _)
      val scored = z.select(col("*"),
        (lit(1.0) / (lit(1.0) + exp(-lin))).as("__p"))
        .select(col("*"),
          (col("__p") - col("y")).as("__diff"),
          (col("__p") * (lit(1.0) - col("__p"))).as("__s"))
      def zc(i: Int) = if (i == 0) lit(1.0) else col(s"z$i")
      val gradExprs = (0 until d1).map(i =>
        avg(col("__diff") * zc(i)).as(s"g$i"))
      val hessExprs = for { i <- 0 until d1; j <- i until d1 } yield
        avg(col("__s") * zc(i) * zc(j)).as(s"h${i}_$j")
      val r = scored.agg(gradExprs.head, (gradExprs.tail ++ hessExprs): _*).collect()(0)
      val g = Array.tabulate(d1)(i => r.getDouble(i))
      val h = Array.ofDim[Double](d1, d1)
      var k = d1
      for { i <- 0 until d1; j <- i until d1 } {
        h(i)(j) = r.getDouble(k); h(j)(i) = h(i)(j); k += 1
      }
      for (i <- 0 until d1) h(i)(i) += QcRidge
      val step = solve(h, g)
      w = w.zip(step).map { case (wi, di) => wi - di }
      // Newton is quadratically convergent: once the step is numerically
      // zero relative to the weights, further iterations are full corpus
      // passes that change nothing — skip them (at 100 TB each is a full
      // pass over the feature frame). The tolerance is far below any
      // decision boundary's sensitivity, so scores/verdicts are unchanged.
      converged = step.map(math.abs).max <
        1e-9 * math.max(1.0, w.map(math.abs).max)
      iter += 1
    }
    (w, mu, sd)
  }

  /** In-place Gaussian elimination with partial pivoting for the Newton
    * system — (d+1)² doubles, driver-side, no dependencies. */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = a.map(_.clone())
    val x = b.clone()
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(r => math.abs(m(r)(col)))
      val (tr, tx) = (m(piv), x(piv)); m(piv) = m(col); x(piv) = x(col)
      m(col) = tr; x(col) = tx
      val d = m(col)(col)
      for (r <- col + 1 until n) {
        val f = m(r)(col) / d
        for (c <- col until n) m(r)(c) -= f * m(col)(c)
        x(r) -= f * x(col)
      }
    }
    val out = Array.fill(n)(0.0)
    for (r <- n - 1 to 0 by -1) {
      var s = x(r)
      for (c <- r + 1 until n) s -= m(r)(c) * out(c)
      out(r) = s / m(r)(r)
    }
    out
  }

  /** The scoring projection shared by the in-query audit and the serving
    * path: standardized features × literal weights → probability and
    * verdict. One narrow codegen pass, no shuffle — the property that
    * makes the distilled model runnable at full corpus scale. */
  private def qcScore(feats: DataFrame, w: Array[Double],
      mu: Array[Double], sd: Array[Double]): DataFrame = {
    val lin = (s"${w(0)}" +: (1 to QcDim).map(i =>
      s"${w(i)} * ((x$i - ${mu(i - 1)}) / ${sd(i - 1)})")).mkString(" + ")
    feats.select(col("*"),
      expr(s"1.0 / (1.0 + exp(-($lin)))").as("qc_score"))
      .withColumn("qc_keep", col("qc_score") >= 0.5)
  }

  /** Oracle-closed registered form — the trained-IVF verdict pattern:
    * learned weights are engine-internal (double aggregation order), so
    * the COMPARED frame carries only portable truths — the corpus size
    * and the teacher gate's keep count (the `quality_gopher` SQL
    * recomputes both) — plus two in-frame verdicts: training accuracy
    * against the teacher is at least [[QcAccuracyFloorPct]]% (a
    * fixture-calibrated floor with margin — a broken trainer lands at
    * the majority-class rate and turns the row red), and the student
    * predicts BOTH classes (a constant classifier cannot pass both
    * verdicts together on the fixtures).
    */
  def qualityClassifier(s: SparkSession, d: String): DataFrame = {
    val feats = qcFeatures(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .localCheckpoint() // read by training passes + the audit
    val (w, mu, sd) = trainQc(feats)
    qcScore(feats, w, mu, sd)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("y").cast("long")).as("n_keep"),
        sum(when(col("qc_keep") === (col("y") === 1.0), 1L).otherwise(0L)).as("n_right"),
        sum(when(col("qc_keep"), 1L).otherwise(0L)).as("n_pred_keep"))
      .select(col("n_docs"), col("n_keep"),
        (col("n_right") * 100 >= col("n_docs") * QcAccuracyFloorPct)
          .as("accuracy_floor_ok"),
        (col("n_pred_keep") > 0L && col("n_pred_keep") < col("n_docs"))
          .as("both_classes_ok"))
  }

  val qualityClassifierSql: String =
    s"""WITH ${TextAnalysis.GopherMetricCtesSql},
       |k AS (
       |  SELECT ${TextAnalysis.GopherKeepSqlFrag} AS keep
       |  FROM m)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  TRUE AS accuracy_floor_ok,
       |  TRUE AS both_classes_ok
       |FROM k""".stripMargin

  /** Persist the trained classifier (weights + standardization — one
    * 13-value row) and serve from it; the LM/DSIR/BM25/novelty serving
    * contract applied to the distilled gate. */
  def writeQualityClassifier(s: SparkSession, d: String, dir: String): Unit = {
    graft.models.ModelManifest.invalidate(s, dir)
    val feats = qcFeatures(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .localCheckpoint()
    val (w, mu, sd) = trainQc(feats)
    // nothing lazy escapes this method: release the feature blocks so a
    // long-lived pipeline session (the smokes) doesn't pin them
    org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(feats)
    import s.implicits._
    Seq((w.toSeq, mu.toSeq, sd.toSeq)).toDF("w", "mu", "sd")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/logreg")
    graft.models.ModelManifest.write(s, dir, "quality_classifier", d,
      Seq("documents"), Seq("n_features" -> w.length.toString))
  }

  /** Read the persisted classifier back: (weights, means, stds) — a
    * single bounded row, the codebook class. */
  def qcModelFromDir(s: SparkSession, modelDir: String)
      : (Array[Double], Array[Double], Array[Double]) = {
    val m = s.read.parquet(s"$modelDir/logreg").collect()(0)
    (m.getAs[Seq[Double]]("w").toArray,
      m.getAs[Seq[Double]]("mu").toArray,
      m.getAs[Seq[Double]]("sd").toArray)
  }

  /** Score a probe batch `(doc_id, text)` with FROZEN weights: one
    * narrow codegen projection per probe — feature extraction + sigmoid,
    * weights inlined as literals. The corpus and the teacher gate are
    * never touched. Output UNORDERED: (doc_id, qc_score 6 dp, qc_keep). */
  def qcScoreBatch(probes: DataFrame, w: Array[Double],
      mu: Array[Double], sd: Array[Double]): DataFrame =
    qcScore(qcFeatures(probes), w, mu, sd)
      .select(col("doc_id"), round(col("qc_score"), 6).as("qc_score"),
        col("qc_keep"))

  /** Convenience serving entry: read the persisted model and score. */
  def qcScoreFromModel(s: SparkSession, modelDir: String,
      probes: DataFrame): DataFrame = {
    graft.models.ModelManifest.validate(s, modelDir, "quality_classifier")
    val (w, mu, sd) = qcModelFromDir(s, modelDir)
    qcScoreBatch(probes, w, mu, sd)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lm_perplexity" -> (lmPerplexity _),
    "lm_quality_calibration" -> (lmQualityCalibration _),
    "quality_classifier" -> (qualityClassifier _),
    "bm25_topk" -> (bm25Topk _),
    "importance_weights" -> (importanceWeights _),
    "selection_report" -> (selectionReport _))

  def oracles: Map[String, String] = Map(
    "lm_perplexity" -> lmPerplexitySql,
    "lm_quality_calibration" -> lmQualityCalibrationSql,
    "quality_classifier" -> qualityClassifierSql,
    "bm25_topk" -> bm25TopkSql,
    "importance_weights" -> importanceWeightsSql,
    "selection_report" -> selectionReportSql)
}
