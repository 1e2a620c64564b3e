package graft.operators

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` — the core
  * training-data-pipeline surface (builder north star): exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale posture:
  *  - Exact dedup shuffles only a 128-bit fingerprint + doc_id, never text.
  *  - Jaccard is the exact (quadratic-in-colliding-docs) baseline; its
  *    candidate generation is an inverted index with a stop-gram cap, which
  *    is the right shape at scale only after LSH pruning — which is what
  *    `dedup_minhash_lsh` adds: candidates come from banded signature
  *    collisions (4 bands × 2 rows), so the pairwise work is proportional
  *    to true near-dups, not to corpus².
  *  - SimHash reduces each doc to one 28-bit integer; candidates come from
  *    a pigeonhole-banded equi-join (4×7-bit chunks), never an all-pairs
  *    scan.
  *  - All hashes are md5-derived (`Portable`) so DuckDB reproduces them.
  */
object Dedup {

  private val N = 3 // shingle size (word trigrams)

  /** See [[graft.Tables.parallelize]]: spreads the CPU-bound per-document
    * hashing and the O(n²) pair joins across every core (the fixture scan
    * is a single input split).
    */
  private def parallelize(s: SparkSession, df: DataFrame): DataFrame =
    Tables.parallelize(s, df)

  /** (doc_id, shingle set) per document: tokenize once, shingle, distinct
    * per-row (array_distinct — no shuffle), carry the set size alongside so
    * jaccard needs neither a window nor a separate sizes subplan.
    */
  private def gramSetDF(s: SparkSession, d: String): DataFrame = {
    Tables.tuneSession(s) // shingle arrays get exploded downstream
    parallelize(s, Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .select(col("doc_id"), array_distinct(Portable.shingles(col("w"), N)).as("grams"))
  }

  private val gramsSqlCte: String =
    s"""words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |grams AS (SELECT DISTINCT doc_id,
       |   unnest(${Portable.shinglesSql(N)}) AS gram FROM words)""".stripMargin

  // ------------------------------------------------------------- exact
  /** Normalized-text exact-duplicate fingerprint — ONE definition shared by
    * [[dedupExact]] and [[dedupIncremental]] (and mirrored by [[normFpSql]]),
    * so "exact duplicate" can never mean two different things. */
  private def normFp: org.apache.spark.sql.Column = Portable.docFingerprint

  /** DuckDB fragment computing the same fingerprint from column `text`. */
  private val normFpSql: String = Portable.docFingerprintSql

  /** Exact dedup: group on the normalized-text fingerprint, keep the lowest
    * doc_id as survivor. Output is the survivor set with multiplicity.
    */
  def dedupExact(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("doc_id"), normFp.as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("survivor_id"), count(lit(1)).as("n_copies"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_unique"),
        sum(col("n_copies") - 1).as("n_removed"),
        min("survivor_id").as("first_survivor"))
  }

  val dedupExactSql: String =
    s"""WITH g AS (
      |  SELECT $normFpSql AS fp,
      |         min(doc_id) AS survivor_id, count(*) AS n_copies
      |  FROM documents GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_unique,
      |       CAST(sum(n_copies - 1) AS BIGINT) AS n_removed,
      |       min(survivor_id) AS first_survivor
      |FROM g""".stripMargin

  // ------------------------------------------------------------- jaccard
  /** Exact word-trigram Jaccard near-dup pairs (similarity >= 0.8).
    * Candidates: distributed self-join on shared shingles; intersection
    * counts from the join, union sizes from per-doc shingle counts.
    *
    * SCALE CONTRACT (measured, PLANS.md round-16 ×1000): exact verify is
    * a ≤×300 tool (≈1.5M docs; 60.9 s at ×300). The plan stays sub-linear
    * in TIME at the third decade (528 s / exponent 0.79 at 5M docs) but
    * its gram-pair shuffle is SPILL-BOUND there — the first ×1000 attempt
    * run mid-chain exhausted 60 GB of scratch and killed the JVM. Past
    * ×300, point the corpus at [[dedupMinhashLsh]] (31 s at ×1000, the
    * measured scale path) and reserve this operator for verifying LSH's
    * candidate pairs, not generating its own from the full corpus.
    */
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame =
    jaccardPairs(gramSetDF(s, d)).orderBy("doc_a", "doc_b")

  /** Docs a gram may appear in before it is dropped as a stop-gram.
    * Pair count per gram is quadratic in its posting-list length; at corpus
    * scale a single hot gram (boilerplate, markup) makes its list the whole
    * job. Removal is SYMMETRIC: similarity is Jaccard over the retained
    * vocabulary — stop-grams leave both the intersections and the set
    * sizes, so identical docs still score 1.0 (a well-defined similarity,
    * not a deflated one). A gram present in hundreds of documents carries
    * no near-dup signal. The fixtures' hottest gram is far below this cap,
    * so the oracle (which applies no cap) still matches exactly.
    */
  val MaxPostingLen = 256

  /** Inverted-index candidate generation from (doc_id, grams) rows:
    * stop-gram decision first from a cheap per-gram COUNT
    * (partial-aggregate friendly; a hot gram's posting list is never
    * collected into a row — at corpus scale it wouldn't fit one), then an
    * equi-self-join on the gram key (i<j): the join IS the inverted
    * index — Spark hash-partitions by gram and streams each posting list's
    * pairs without ever materializing it, entirely inside whole-stage
    * codegen. Jaccard prefix-filters BOTH sides of the indexed stream
    * ([[jaccardCandidates]]) so only ~(1−τ) of each doc's grams enter the
    * join; containment prefix-filters the smaller side of each pair only
    * (see [[dedupContainment]] — its bound is asymmetric).
    *
    * Grams are fingerprinted to 64-bit longs (`xxhash64`) right after the
    * explode, so every downstream shuffle/join keys on 8 bytes instead of a
    * ~20-byte string. The hash never reaches the output — the oracle keeps
    * exact string grams — so this is an internal-key change only; collision
    * probability is ~n²/2⁶⁵ (negligible at fixture vocabulary; ~3% chance
    * of ONE colliding pair at a billion distinct grams, which would merge
    * that single pair's postings and perturb a handful of similarity
    * scores) — the standard fingerprinting tradeoff in the shingling
    * literature. The exploded gram stream is
    * localCheckpoint'd once (16 B/row) so the count pass and the join read
    * a materialized frame instead of re-running tokenize+shingle. The
    * dropped-gram count is observable as the `jaccard_audit` metric
    * (`stop_grams_dropped`).
    */
  /** The retained (doc_id, hashed-gram) stream after the stop-gram cap —
    * the inverted-index input shared by [[jaccardPairs]] and the
    * scaling-slope candidate counter. */
  private def retainedGrams(gramSets: DataFrame): DataFrame = {
    val grams = gramSets
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("g"))
      .localCheckpoint()
    val hot = grams.groupBy("g").agg(count(lit(1)).as("cnt"))
      .observe("jaccard_audit",
        sum(when(col("cnt") >= MaxPostingLen, 1L).otherwise(0L))
          .as("stop_grams_dropped"))
      .filter(col("cnt") >= MaxPostingLen)
      .select("g")
    // stop-grams are RARE by construction → broadcast anti-join, narrow
    grams.join(broadcast(hot), Seq("g"), "left_anti")
  }

  /** Prefix-filter threshold, deliberately just UNDER the reported 0.8:
    * both engines filter on the 4-dp ROUNDED jaccard, so a pair with true
    * J ∈ [0.79995, 0.8) still reaches the output — the lossless prefix
    * bound must therefore be derived from 0.79995, not 0.8; 0.7999 adds a
    * float-comparison margin at the cost of ~nothing (prefix lengths are
    * identical for all n < 20000 grams). */
  private val JaccardTau = 0.7999

  /** Per-doc retained-gram sets as SORTED hashed arrays (gs) with their
    * sizes — one linear doc-keyed exchange (it replaces the former
    * separate `sizes` aggregation), localCheckpoint'd because the prefix
    * explode and both verify-join sides read it. The sort order (hash
    * value) is the canonical total order the prefix filter needs. */
  private def jaccardDocArrays(retained: DataFrame): DataFrame =
    retained.groupBy("doc_id")
      .agg(sort_array(collect_list(col("g"))).as("gs"),
        count(lit(1)).as("n"))
      .localCheckpoint()

  /** ppjoin-style prefix-filtered candidate pairs (Chaudhuri et al.
    * SSJoin '06 / Bayardo AllPairs '07 / Xiao ppjoin '08): index only each
    * doc's FIRST n − ⌈τ·n⌉ + 1 grams in the canonical order. Lossless for
    * J ≥ τ by the prefix-filter lemma — a matching pair shares ≥⌈τ·n⌉
    * grams with each side, so missing both prefixes is impossible — and
    * the posting lists (hence the self-join shuffle) shrink by ~(1−τ).
    *
    * Three filters run INSIDE the join condition, before the distinct:
    *  - size: min(na,nb) ≥ τ·max(na,nb) (implied by J ≤ min/max);
    *  - positional (the 'pp' in ppjoin): for a row matching gram t at
    *    0-based sorted positions (pa, pb), the overlap is bounded by
    *    min(pa,pb) + 1 + min(na−pa−1, nb−pb−1) — common grams below t
    *    can't exceed the shorter prefix-below-t, above t can't exceed the
    *    shorter suffix. Rows whose bound can't reach the required
    *    α = ⌈τ/(1+τ)·(na+nb)⌉ are dropped; a TRUE pair (o ≥ α) satisfies
    *    the bound on EVERY shared-gram row (the bound over-estimates o),
    *    so no true pair loses all its rows — lossless per row, unlike
    *    ppjoin's tighter accumulating bound, which is not expressible as
    *    a per-row predicate.
    * Measured at ×100 (near-dup-heavy fixture): prefix alone cut the
    * exact stage's candidates to 8.1M; prefix+positional to 7.5M — the
    * fixture's candidates share many grams, so most survive both filters
    * and the verify joins' shape (see [[jaccardPairs]]) carries the
    * larger share of the win there. */
  private def jaccardCandidates(docsArr: DataFrame): DataFrame = {
    val prefix = docsArr.select(col("doc_id"), col("n"),
      posexplode(slice(col("gs"), lit(1),
        (col("n") - ceil(col("n") * JaccardTau) + lit(1)).cast("int")))
        .as(Seq("p", "g")))
    val alpha = ceil(lit(JaccardTau / (1 + JaccardTau)) *
      (col("a.n") + col("b.n")))
    prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") >= col("b.n") * JaccardTau &&
          col("b.n") >= col("a.n") * JaccardTau &&
          least(col("a.p"), col("b.p")) + 1 +
            least(col("a.n") - col("a.p") - 1, col("b.n") - col("b.p") - 1)
            >= alpha)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  def jaccardPairs(gramSets: DataFrame): DataFrame = {
    val docsArr = jaccardDocArrays(retainedGrams(gramSets))
    // verify stage: exact intersection over the FULL retained sets (the
    // prefix join only nominates; array_intersect on the sorted hashed
    // arrays re-derives the same inter the old pair-groupBy counted).
    // shuffle_hash, not sort-merge: the probe side carries a full gram
    // array per candidate row after the first join, and sorting those
    // wide rows was the measured dominant cost of the verify at ×100
    // (the build side is the doc-keyed array relation — corpus-sized but
    // array-per-doc, exactly what a per-partition hash map holds).
    jaccardCandidates(docsArr)
      .join(docsArr.hint("shuffle_hash").select(col("doc_id").as("doc_a"),
        col("gs").as("ga"), col("n").as("na")), Seq("doc_a"))
      .join(docsArr.hint("shuffle_hash").select(col("doc_id").as("doc_b"),
        col("gs").as("gb"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        // native merge-count over the sorted distinct gram arrays — see
        // [[graft.functions.SortedLongIntersectCount]]: value-identical to
        // size(array_intersect(ga, gb)) here, no per-pair hash set or
        // intersection-array allocation (r17)
        {
          import org.apache.spark.sql.GraftBridge.{column, expression}
          column(graft.functions.SortedLongIntersectCount(
            expression(col("ga")), expression(col("gb"))))
            .cast("double").as("inter")
        },
        col("na"), col("nb"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  /** Candidate-pair count of the jaccard candidate stage (distinct doc
    * pairs nominated by the PREFIX-FILTERED inverted index) — the pairwise
    * verify work [[jaccardPairs]] performs before any similarity
    * threshold, counted off the SAME [[jaccardCandidates]] stage the
    * production query plans so the measurement can never drift from the
    * production join. The ScalingSlopeSpec measures it at two corpus
    * sizes against the banded paths' candidate counts. */
  private[graft] def gramCandidateCount(s: SparkSession, d: String): Long =
    jaccardCandidates(jaccardDocArrays(retainedGrams(gramSetDF(s, d)))).count()

  /** Stage-bisection seams for `tools.GramDebug`. */
  private[graft] def gramSetCount(s: SparkSession, d: String): Long =
    gramSetDF(s, d).count()
  private[graft] def retainedGramCount(s: SparkSession, d: String): Long =
    retainedGrams(gramSetDF(s, d)).count()

  /** Candidate-pair count of the MinHash LSH banding (distinct doc pairs
    * colliding on ≥1 band signature) — [[lshPairs]]'s pairwise work before
    * the est-Jaccard threshold, counted off the SAME [[lshScored]] stage
    * the production query plans. Band signatures are 56-bit compound keys,
    * so collisions track genuinely similar pairs, not corpus size — the
    * ScalingSlopeSpec asserts this grows ~linearly while the quadratic
    * baselines grow ~n². */
  private[graft] def lshCandidateCount(s: SparkSession, d: String): Long =
    lshScored(s, d).count()

  val dedupNgramJaccardSql: String =
    s"""WITH $gramsSqlCte,
       |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM grams a JOIN grams b
       |    ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jaccard
       |FROM inter
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------- minhash+lsh
  /** MinHash (8 permutations) + LSH banding (4 bands × 2 rows): candidate
    * pairs collide on at least one band signature; their estimated Jaccard
    * is the fraction of agreeing signature components. This is the scale
    * path: pairwise work only on banded collisions.
    */
  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame =
    lshPairs(s, d).orderBy("doc_a", "doc_b")

  /** (doc_id, sig, band, bandsig) rows — the MinHash signature and its LSH
    * banding as per-row array expressions: one scan, no shuffle. Shared by
    * [[lshPairs]] (self-join) and [[dedupIncremental]] (batch-vs-history
    * join).
    */
  private def bandsDF(s: SparkSession, d: String): DataFrame = {
    val k = Portable.MinhashPerms.size
    val sigCols = Portable.MinhashPerms.map { case (a, b) =>
      expr(s"array_min(transform(hs, h -> ($a * h + $b) % ${Portable.MinhashPrime}))")
    }
    // a gramless doc (< n tokens) has NO signature: every MinHash component
    // would be array_min([]) = NULL and concat_ws would collapse all such
    // docs onto ONE degenerate band signature, band-colliding them with each
    // other. The SQL oracle's unnest of an empty gram list naturally emits
    // zero rows for these docs; mirror that. (lshPairs was already immune —
    // NULL-component comparisons score est_jaccard 0 — but consumers joining
    // on raw band equality, like dedupIncremental, are not.)
    val sig = gramSetDF(s, d)
      .filter(size(col("grams")) > 0)
      // hash each gram exactly once, then run the 8 permutations over longs
      .select(col("doc_id"),
        expr("transform(grams, g -> CAST(conv(substring(md5(g), 1, 7), 16, 10) AS BIGINT))")
          .as("hs"))
      .select(col("doc_id"), array(sigCols: _*).as("sig"))
    // band b = components (2b, 2b+1); bandsig mirrors the oracle's
    // string_agg of "j=mh" in string order (j is a single digit)
    val bandStructs = (0 until k / 2).map { b =>
      struct(lit(b).as("band"),
        concat_ws(":",
          concat_ws("=", lit(2 * b), element_at(col("sig"), 2 * b + 1)),
          concat_ws("=", lit(2 * b + 1), element_at(col("sig"), 2 * b + 2)))
          .as("bandsig"))
    }
    sig.select(col("doc_id"), col("sig"),
      explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("sig"), col("bs.band"), col("bs.bandsig"))
  }

  /** The unordered LSH candidate-pair pipeline (mirrors the `lshpairs` SQL
    * CTE) — shared by the ranked query above and [[dedupClusters]], which
    * would otherwise pay the output sort only to discard it.
    */
  /** One row per distinct banded candidate pair with its estimated
    * Jaccard — [[lshPairs]] minus the threshold, shared with
    * [[lshCandidateCount]] so the slope measurement and the production
    * query are the same plan by construction. */
  private def lshScored(s: SparkSession, d: String): DataFrame = {
    // Whole signature computed as per-row array expressions — one scan, no
    // shuffle until the (band, bandsig) self-join; that join's build side is
    // 4 small rows per doc, so at cluster scale the only wide exchange is
    // keyed by band signature (i.e., proportional to docs, not pairs).
    val k = Portable.MinhashPerms.size
    val bands = bandsDF(s, d)
    // Estimate per collision row, then collapse multi-band collisions with a
    // cheap (doc_a, doc_b) aggregate — the previous distinct() hashed the
    // full 8-long signature arrays through the exchange for the same effect.
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bandsig") === col("y.bandsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        round(size(filter(zip_with(col("x.sig"), col("y.sig"), (x, y) => x === y),
          v => v)).cast("double") / k, 4).as("est_jaccard"))
      .groupBy("doc_a", "doc_b")
      .agg(first("est_jaccard").as("est_jaccard"))
  }

  private def lshPairs(s: SparkSession, d: String): DataFrame =
    lshScored(s, d).filter(col("est_jaccard") >= 0.5)

  /** The MinHash signature + banding CTE chain (through `bands`), shared by
    * the pair oracles and the incremental oracle. */
  private val bandsSqlCtes: String = {
    val permRows = Portable.MinhashPerms.zipWithIndex
      .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
    s"""$gramsSqlCte,
       |hg AS (SELECT doc_id, ${Portable.hash28Sql("gram")} AS h FROM grams),
       |perms(j, a, b) AS (SELECT * FROM (VALUES $permRows)),
       |sig AS (
       |  SELECT doc_id, j, min((a * h + b) % ${Portable.MinhashPrime}) AS mh
       |  FROM hg CROSS JOIN perms GROUP BY 1, 2),
       |bands AS (
       |  SELECT doc_id, CAST(j // 2 AS INTEGER) AS band,
       |         string_agg(j || '=' || mh, ':' ORDER BY j || '=' || mh) AS bandsig
       |  FROM sig GROUP BY 1, 2)""".stripMargin
  }

  /** The LSH candidate-pair pipeline as a CTE chain, shared by the
    * minhash query's oracle and the clustering oracle's recursive CTE. */
  private val lshPairsSqlCtes: String = {
    s"""$bandsSqlCtes,
       |candidates AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bandsig = y.bandsig AND x.doc_id < y.doc_id),
       |lshpairs AS (
       |  SELECT doc_a, doc_b,
       |    round(CAST(sum(CASE WHEN sx.mh = sy.mh THEN 1 ELSE 0 END) AS DOUBLE)
       |          / ${Portable.MinhashPerms.size}, 4) AS est_jaccard
       |  FROM candidates
       |  JOIN sig sx ON doc_a = sx.doc_id
       |  JOIN sig sy ON doc_b = sy.doc_id AND sx.j = sy.j
       |  GROUP BY 1, 2
       |  HAVING round(CAST(sum(CASE WHEN sx.mh = sy.mh THEN 1 ELSE 0 END) AS DOUBLE)
       |          / ${Portable.MinhashPerms.size}, 4) >= 0.5)""".stripMargin
  }

  val dedupMinhashLshSql: String =
    s"""WITH $lshPairsSqlCtes
       |SELECT doc_a, doc_b, est_jaccard FROM lshpairs
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------- simhash
  /** 32-bit SimHash over word unigrams: bit b of the fingerprint is the
    * sign of the sum of (+1/-1) votes from each token's hash bit b. Pairs
    * within Hamming distance 3 are near-dups. Each doc collapses to one
    * integer before any join — the cheapest near-dup representation.
    */
  /** The SimHash chunk-collision candidate pairs (doc_a, doc_b, hamming),
    * emit-once per pair, BEFORE the Hamming threshold — [[dedupSimhash]]'s
    * pairwise work, exposed so the ScalingSlopeSpec can measure how chunk
    * collisions grow with corpus size (≈ n²/2⁷ per chunk at fixed 7-bit
    * chunk width: sub-quadratic by the bucket constant, not linear —
    * production scaling widens the fingerprint so chunk bits grow with
    * log n, which this 28-bit oracle-shared variant deliberately fixes).
    */
  private[graft] def simhashCandidates(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val sim = parallelize(s, Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        column(graft.functions.SimHashBits(
          expression(Portable.tokens(col("text"))), 28)).as("simhash"))
    // Pigeonhole banding: split the 28 bits into 4 chunks of 7. A pair within
    // Hamming distance 3 differs in at most 3 chunks, so it MUST agree exactly
    // on at least one — candidates come from an equi-self-join on
    // (chunk_idx, chunk_bits), a hash-partitioned shuffle proportional to
    // chunk collisions, never an all-pairs scan. Same output as the
    // brute-force formulation (the pigeonhole guarantee is exact, not
    // probabilistic), so the oracle is unchanged.
    val chunkStructs = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), 7 * c).bitwiseAND(lit(0x7fL)).as("bits"))
    }
    val chunks = sim
      .select(col("doc_id"), col("simhash"), explode(array(chunkStructs: _*)).as("cb"))
      .select(col("doc_id"), col("simhash"), col("cb.chunk"), col("cb.bits"))
    // A pair can agree on several chunks; instead of a post-join dedup
    // aggregate, keep only the collision row whose chunk is the FIRST chunk
    // the two fingerprints agree on — computable from the xor, so each
    // qualifying pair survives exactly once and the join output needs no
    // regrouping.
    val xor = col("p.simhash").bitwiseXOR(col("q.simhash"))
    val firstAgreeingChunk = (3 to 0 by -1).foldLeft(lit(-1)) { (acc, c) =>
      when(shiftright(xor, 7 * c).bitwiseAND(lit(0x7fL)) === 0, lit(c)).otherwise(acc)
    }
    chunks.as("p")
      .join(chunks.as("q"),
        col("p.chunk") === col("q.chunk") && col("p.bits") === col("q.bits") &&
          col("p.doc_id") < col("q.doc_id"))
      .filter(col("p.chunk") === firstAgreeingChunk)
      .select(col("p.doc_id").as("doc_a"), col("q.doc_id").as("doc_b"),
        bit_count(xor).as("hamming"))
  }

  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    simhashCandidates(s, d)
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")

  val dedupSimhashSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |hs AS (SELECT doc_id, ${Portable.hash28Sql("tok")} AS h FROM toks),
       |votes AS (
       |  SELECT doc_id, bit,
       |    sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM hs CROSS JOIN (SELECT unnest(range(0, 28)) AS bit) b
       |  GROUP BY 1, 2),
       |sim AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY 1)
       |SELECT p.doc_id AS doc_a, q.doc_id AS doc_b,
       |  CAST(bit_count(xor(p.simhash, q.simhash)) AS INTEGER) AS hamming
       |FROM sim p JOIN sim q ON p.doc_id < q.doc_id
       |WHERE bit_count(xor(p.simhash, q.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------- ensemble
  /** Multi-signal dedup evidence — what a production dedup service emits
    * per document to drive keep/drop decisions: the exact-copy count
    * (normalized fingerprint), the MinHash near-neighbor count
    * (est_jaccard >= 0.5) and the SimHash near-neighbor count
    * (hamming <= 3), folded into one verdict per doc ('exact' beats
    * 'near' beats 'unique'). Composes the three existing generators
    * unchanged — every candidate stage is a banded/keyed equi-join (work
    * ∝ collisions) and the fold is two pair-list explodes + one
    * fp-partitioned window; nothing all-pairs, nothing new shuffles more
    * than its standalone query already did.
    */
  def dedupEnsemble(s: SparkSession, d: String): DataFrame = {
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val base = Tables.documents(s, d)
      .select(col("doc_id"), normFp.as("fp"))
      .withColumn("n_exact_copies", count(lit(1)).over(wFp))
      .select("doc_id", "n_exact_copies")
    def neighborCounts(pairs: DataFrame, alias: String): DataFrame = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as(alias))
    val mh = neighborCounts(lshPairs(s, d), "n_mh_neighbors")
    val sh = neighborCounts(dedupSimhash(s, d), "n_sh_neighbors")
    base
      .join(mh, Seq("doc_id"), "left")
      .join(sh, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_exact_copies"),
        coalesce(col("n_mh_neighbors"), lit(0L)).as("n_mh_neighbors"),
        coalesce(col("n_sh_neighbors"), lit(0L)).as("n_sh_neighbors"))
      .withColumn("verdict",
        when(col("n_exact_copies") > 1, "exact")
          .when(col("n_mh_neighbors") + col("n_sh_neighbors") > 0, "near")
          .otherwise("unique"))
      .orderBy("doc_id")
  }

  val dedupEnsembleSql: String =
    s"""WITH $lshPairsSqlCtes,
       |toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |shs AS (SELECT doc_id, ${Portable.hash28Sql("tok")} AS h FROM toks),
       |votes AS (
       |  SELECT doc_id, bit,
       |    sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM shs CROSS JOIN (SELECT unnest(range(0, 28)) AS bit) b
       |  GROUP BY 1, 2),
       |sim AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY 1),
       |shpairs AS (
       |  SELECT p.doc_id AS doc_a, q.doc_id AS doc_b
       |  FROM sim p JOIN sim q ON p.doc_id < q.doc_id
       |  WHERE bit_count(xor(p.simhash, q.simhash)) <= 3),
       |fp AS (SELECT doc_id, $normFpSql AS fp FROM documents),
       |exact AS (
       |  SELECT doc_id, CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_exact_copies
       |  FROM fp),
       |mh AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT doc_a AS doc_id FROM lshpairs
       |    UNION ALL SELECT doc_b FROM lshpairs) GROUP BY 1),
       |sh AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT doc_a AS doc_id FROM shpairs
       |    UNION ALL SELECT doc_b FROM shpairs) GROUP BY 1)
       |SELECT e.doc_id, e.n_exact_copies,
       |  CAST(coalesce(mh.n, 0) AS BIGINT) AS n_mh_neighbors,
       |  CAST(coalesce(sh.n, 0) AS BIGINT) AS n_sh_neighbors,
       |  CASE WHEN e.n_exact_copies > 1 THEN 'exact'
       |       WHEN coalesce(mh.n, 0) + coalesce(sh.n, 0) > 0 THEN 'near'
       |       ELSE 'unique' END AS verdict
       |FROM exact e
       |LEFT JOIN mh ON e.doc_id = mh.doc_id
       |LEFT JOIN sh ON e.doc_id = sh.doc_id
       |ORDER BY e.doc_id""".stripMargin

  // ------------------------------------------------------------- incremental
  /** Incremental dedup — the shape a production dedup service actually
    * runs: an incoming BATCH (doc_id % 10 >= 8, a deterministic 20% stand-in
    * for "today's crawl") is checked against the HISTORICAL corpus
    * (everything else) for exact duplicates (normalized-text fingerprint)
    * and near-duplicates (shared MinHash LSH band), without ever comparing
    * history against itself. Emits each flagged batch doc with its match
    * type ('exact' wins over 'near') and the distinct history docs hit per
    * mechanism.
    *
    * Scale posture: no join-strategy hint anywhere — the batch here is a
    * corpus FRACTION (20%), which grows with the corpus, so an
    * unconditional broadcast would hit the 8 GB broadcast ceiling at scale
    * and die rather than degrade. Catalyst's autoBroadcastJoinThreshold
    * (plus AQE's runtime re-plan) picks BHJ while the batch side is small
    * and falls back to a shuffled hash/sort-merge join when it isn't — the
    * same pattern as q18_large_orders. There is still no history-×-history
    * work: each join probes history rows against batch artifacts only.
    * History is scanned once PER MATCHING ARTIFACT — one fingerprint pass,
    * one MinHash pass — since sharing a single scan would mean
    * materializing corpus-sized text; [[dedupIncrementalIndexed]] is the
    * production formulation that reads both artifacts from a persisted
    * dedup index instead of re-deriving them from history text.
    */
  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val isBatch = col("doc_id") % 10 >= 8
    val fp = Tables.documents(s, d).select(col("doc_id"), normFp.as("fp"))
    val bands = bandsDF(s, d).select("doc_id", "band", "bandsig")
    incrementalMatches(fp.filter(!isBatch), bands.filter(!isBatch),
      fp.filter(isBatch), bands.filter(isBatch))
  }

  /** Shared increment-vs-history match shape: exact (fingerprint) + near
    * (LSH band) joins, 'exact' wins, per-batch-doc distinct history hits.
    * Strategy is left to Catalyst/AQE — see [[dedupIncremental]]'s scale
    * note. */
  private def incrementalMatches(histFp: DataFrame, histBands: DataFrame,
                                 batchFp: DataFrame, batchBands: DataFrame): DataFrame = {
    val exact = histFp.as("h")
      .join(batchFp.as("b"), col("h.fp") === col("b.fp"))
      .groupBy(col("b.doc_id").as("doc_id"))
      .agg(count_distinct(col("h.doc_id")).as("n_exact"))
    val near = histBands.as("h")
      .join(batchBands.as("b"),
        col("h.band") === col("b.band") && col("h.bandsig") === col("b.bandsig"))
      .groupBy(col("b.doc_id").as("doc_id"))
      .agg(count_distinct(col("h.doc_id")).as("n_near"))
    exact.join(near, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("n_exact").isNotNull, "exact").otherwise("near").as("match_type"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy("doc_id")
  }

  val dedupIncrementalSql: String =
    s"""WITH $bandsSqlCtes,
       |fp AS (
       |  SELECT doc_id, $normFpSql AS fp
       |  FROM documents),
       |bexact AS (
       |  SELECT b.doc_id, count(DISTINCT h.doc_id) AS n_exact
       |  FROM fp h JOIN fp b ON h.fp = b.fp
       |  WHERE b.doc_id % 10 >= 8 AND h.doc_id % 10 < 8
       |  GROUP BY 1),
       |bnear AS (
       |  SELECT b.doc_id, count(DISTINCT h.doc_id) AS n_near
       |  FROM bands h JOIN bands b
       |    ON h.band = b.band AND h.bandsig = b.bandsig
       |  WHERE b.doc_id % 10 >= 8 AND h.doc_id % 10 < 8
       |  GROUP BY 1)
       |SELECT coalesce(e.doc_id, n.doc_id) AS doc_id,
       |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact' ELSE 'near' END AS match_type,
       |  CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
       |  CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_near
       |FROM bexact e FULL OUTER JOIN bnear n ON e.doc_id = n.doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- incremental (persisted index)
  /** Per-JVM local path for the persisted dedup index of corpus `d`
    * (keyed on the corpus dir so sf0.01 / sf0.1 never collide; the parent
    * is a fresh per-JVM temp dir so concurrent JVMs — bench next to tests
    * — never race each other's writes, and a shutdown hook deletes the
    * whole tree so repeated runs don't accumulate corpus-sized index
    * trees in tmp, [[Scratch.tempParent]]). In production this is a table
    * location; here it's a tmp dir. */
  private lazy val indexScratchParent: java.nio.file.Path =
    Scratch.tempParent("graft_dedup_index")
  def dedupIndexDir(d: String): String = {
    val tag = f"${graft.functions.Portable.hash28Jvm(d)}%08x"
    new java.io.File(indexScratchParent.toFile, tag).getAbsolutePath
  }

  /** Maintenance job: materialize the HISTORY side's dedup artifacts —
    * normalized-text fingerprints and MinHash LSH bands — as parquet,
    * partition-pruned by artifact (two tables, not one union). This is the
    * index the scaladoc of [[dedupIncremental]] promises: each increment
    * appends its own artifacts after processing, so the NEXT increment
    * never re-derives history hashes from corpus-sized text. Cost is one
    * pass over history per artifact, paid once, amortized over every later
    * increment. */
  def writeDedupIndex(s: SparkSession, d: String, indexDir: String): Unit = {
    graft.models.ModelManifest.invalidate(s, indexDir)
    val isBatch = col("doc_id") % 10 >= 8
    Tables.documents(s, d).filter(!isBatch)
      .select(col("doc_id"), normFp.as("fp"))
      .write.mode("overwrite").parquet(s"$indexDir/fp")
    bandsDF(s, d).select("doc_id", "band", "bandsig").filter(!isBatch)
      .write.mode("overwrite").parquet(s"$indexDir/bands")
    graft.models.ModelManifest.write(s, indexDir, "dedup_incremental_index",
      d, Seq("documents"))
  }

  /** The increment-side read path: joins the incoming batch's artifacts
    * against the PERSISTED index only — history text is never touched
    * (the spec asserts the plan's only `documents` scans are the
    * batch-filtered ones). Output is identical to [[dedupIncremental]]. */
  def dedupIncrementalFromIndex(s: SparkSession, d: String, indexDir: String): DataFrame = {
    // the index encodes THIS corpus's history partition: corpus drift
    // since the build means the history hashes are stale — fail loudly
    graft.models.ModelManifest.validateAgainstCorpus(
      s, indexDir, "dedup_incremental_index", d)
    val isBatch = col("doc_id") % 10 >= 8
    val batchFp = Tables.documents(s, d).filter(isBatch)
      .select(col("doc_id"), normFp.as("fp"))
    val batchBands = bandsDF(s, d).select("doc_id", "band", "bandsig").filter(isBatch)
    incrementalMatches(
      s.read.parquet(s"$indexDir/fp"), s.read.parquet(s"$indexDir/bands"),
      batchFp, batchBands)
  }

  /** Self-contained queries() entry: build the index ONCE per JVM per
    * corpus, then run the increment against it — matching the operator's
    * real cost model (maintenance amortized over increments) AND keeping
    * Bench honest: the cold pass pays the one-time build, warm passes
    * measure the read path the plan spec proves. The spec exercises the
    * two halves separately to prove the read path's scan set. */
  private val builtIndexes = scala.collection.concurrent.TrieMap.empty[String, String]
  // the build must run at most once per corpus: TrieMap.getOrElseUpdate
  // may evaluate a racing by-name thunk in BOTH threads even though only
  // one value wins, and two concurrent overwrite-mode writes into the
  // same deterministic dir clobber each other's files
  private val indexBuildLock = new Object
  def dedupIncrementalIndexed(s: SparkSession, d: String): DataFrame = {
    val idx = indexBuildLock.synchronized {
      builtIndexes.getOrElseUpdate(d, {
        val dir = dedupIndexDir(d)
        writeDedupIndex(s, d, dir)
        dir
      })
    }
    dedupIncrementalFromIndex(s, d, idx)
  }

  // ------------------------------------------------------------- span dedup
  /** Tokens per span and the corpus-occurrence count at which a span is
    * considered boilerplate. */
  val SpanTokens = 10
  val SpanHotThreshold = 3

  /** C4-style duplicate-span removal (Raffel et al. 2020 drop repeated
    * lines/paragraphs corpus-wide; RefinedWeb repeats the recipe): split
    * each document into consecutive [[SpanTokens]]-token spans, find spans
    * occurring [[SpanHotThreshold]]+ times across the CORPUS, keep only the
    * globally-first occurrence (lowest doc_id, then position) of each hot
    * span, and reassemble the surviving text in document order. Emits
    * per-doc span counts plus the md5 of the cleaned text.
    *
    * Shape at scale: the honest cost of corpus-level span dedup is two wide
    * exchanges — one keyed by span (the occurrence count and the
    * first-occurrence rank come from two window functions over the SAME
    * partitioning, so one shuffle serves both), one keyed by doc_id for
    * reassembly. Nothing is collected; the hot-span decision never
    * materializes a posting list.
    */
  /** THE per-document span relation — `(doc_id, n_spans, pos, span)` from
    * consecutive [[SpanTokens]]-token spans — shared by [[dedupSpans]] and
    * [[dedupSpanBloom]] so the span definition (and hence what "duplicate
    * span" means) cannot drift between the removal pass and the
    * membership screen. One tokenize pass, exploded. */
  private def docSpans(s: SparkSession, d: String): DataFrame = {
    Tables.tuneSession(s) // span arrays get exploded
    parallelize(s, Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .select(col("doc_id"), expr(
        s"""transform(sequence(0, CAST(ceil(size(w) / ${SpanTokens}.0) AS INT) - 1),
           |  i -> array_join(slice(w, i * $SpanTokens + 1, $SpanTokens), ' '))""".stripMargin)
        .as("spans"))
      .select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"),
        posexplode(col("spans")).as(Seq("pos", "span")))
  }

  /** DuckDB CTE chain producing the same relation as [[docSpans]] (tables
    * `w`, `sp`, `e`; `e` has doc_id, n_spans, pos, span) — shared by the
    * span-dedup oracles. */
  private val docSpansSqlCtes: String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sp AS (SELECT doc_id, list_transform(
       |    range(0, CAST(ceil(len(w) / ${SpanTokens}.0) AS INT)),
       |    i -> {'pos': i, 'span': array_to_string(
       |            list_slice(w, i * $SpanTokens + 1, i * $SpanTokens + $SpanTokens), ' ')})
       |  AS spans FROM w),
       |e AS (SELECT doc_id, CAST(len(spans) AS BIGINT) AS n_spans,
       |        unnest(spans, recursive := true) FROM sp)""".stripMargin

  def dedupSpans(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = docSpans(s, d)
    val bySpan = Window.partitionBy("span")
    val kept = spans
      .withColumn("cnt", count(lit(1)).over(bySpan))
      .withColumn("rn", row_number().over(bySpan.orderBy("doc_id", "pos")))
      .filter(col("cnt") < SpanHotThreshold || col("rn") === 1)
    kept.groupBy("doc_id")
      .agg(
        first("n_spans").as("n_spans"),
        count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("span")))),
            x => x.getField("span")))).as("clean_fp"))
      .select(col("doc_id"), col("n_spans"), col("n_kept"),
        (col("n_spans") - col("n_kept")).as("n_dropped"), col("clean_fp"))
      .orderBy("doc_id")
  }

  val dedupSpansSql: String =
    s"""WITH $docSpansSqlCtes,
       |m AS (SELECT *, count(*) OVER (PARTITION BY span) AS cnt,
       |        row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
       |      FROM e),
       |k AS (SELECT * FROM m WHERE cnt < $SpanHotThreshold OR rn = 1)
       |SELECT doc_id, any_value(n_spans) AS n_spans,
       |  CAST(count(*) AS BIGINT) AS n_kept,
       |  CAST(any_value(n_spans) - count(*) AS BIGINT) AS n_dropped,
       |  md5(string_agg(span, ' ' ORDER BY pos)) AS clean_fp
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- span bloom screen
  /** Bloom-filter sizing for [[dedupSpanBloom]]: expected distinct history
    * spans and filter bits (≈8 bits/item → ~2% false positives). */
  val SpanBloomItems: Long = 1000000L
  val SpanBloomBits: Long = 8000000L

  /** Bloom-filter span-membership screen — the 100 TB formulation of
    * incremental span dedup (the Dolma-pipeline shape: a Bloom filter over
    * history, not a join against it): the HISTORY corpus's spans
    * (doc_id % 10 < 8 — the [[dedupIncremental]] split) are folded into
    * ONE mergeable `bloom_filter_agg` sketch; the incoming BATCH's spans
    * probe it with `might_contain`. Unlike [[dedupIncremental]]'s
    * artifact joins, the history side here never shuffles row data at
    * all — each executor folds its partition into a fixed-size bit
    * array, the partials OR together, and the probe side receives the
    * sketch as a single broadcast value. That is the production path.
    *
    * The compared frame follows the sketch-family oracle pattern
    * (`approx_distinct`, `percentile_tdigest`): per batch document, the
    * EXACT span-membership counts (engine-portable — a distinct-history
    * left join both engines can run) plus the in-frame verdict
    * `bloom_covers_exact` — true iff NO exactly-duplicated span was
    * missed by the sketch, which is the Bloom filter's no-false-negative
    * guarantee. The oracle asserts it as a TRUE literal, so a sketch
    * regression (a dropped insertion, a hash mismatch between build and
    * probe) turns the hash compare red. False-positive behavior is
    * measured in OperatorSpec, not compared here (it is
    * parameter-dependent, not semantics).
    */
  /** Per-batch-span flag frame `(doc_id, n_spans, exact_hit, bloom_hit)`
    * backing [[dedupSpanBloom]] — exposed to the spec so the sketch's
    * false-positive behavior (a sizing property, not semantics, hence not
    * in the oracle-compared frame) can be measured corpus-wide. */
  private[graft] def spanBloomFlags(s: SparkSession, d: String): DataFrame = {
    // bloom_filter_agg / might_contain are Catalyst-internal (planted by
    // the runtime-filter rule, not registered for SQL), so the Column
    // trees are built directly — the GraftBridge pattern the native
    // vector/PQ kernels already use
    import org.apache.spark.sql.GraftBridge.{column, expression, scalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val isBatch = col("doc_id") % 10 >= 8
    val spans = docSpans(s, d)
    val hist = spans.filter(!isBatch)
    val batch = spans.filter(isBatch)
    // the build side: one pass over history folding spans into a single
    // bit-array sketch, delivered to the probe as a scalar subquery (the
    // form might_contain requires — executed once, broadcast as a value)
    val bloom = hist.agg(
      column(new BloomFilterAggregate(expression(xxhash64(col("span"))),
        Literal(SpanBloomItems), Literal(SpanBloomBits)).toAggregateExpression())
        .as("bf"))
    val histSpans = hist.select(col("span")).distinct()
      .withColumn("in_hist", lit(1L))
    batch
      .join(histSpans, Seq("span"), "left")
      .select(col("doc_id"), col("n_spans"),
        col("in_hist").isNotNull.as("exact_hit"),
        column(BloomFilterMightContain(scalarSubquery(bloom),
          expression(xxhash64(col("span"))))).as("bloom_hit"))
  }

  def dedupSpanBloom(s: SparkSession, d: String): DataFrame =
    spanBloomFlags(s, d)
      .groupBy("doc_id")
      .agg(first("n_spans").as("n_spans"),
        sum(when(col("exact_hit"), 1L).otherwise(0L)).as("n_exact_dup"),
        (sum(when(col("exact_hit") && !col("bloom_hit"), 1L).otherwise(0L)) === 0L)
          .as("bloom_covers_exact"))
      .orderBy("doc_id")

  val dedupSpanBloomSql: String =
    s"""WITH $docSpansSqlCtes,
       |hist AS (SELECT DISTINCT span FROM e WHERE doc_id % 10 < 8),
       |b AS (SELECT doc_id, n_spans, span FROM e WHERE doc_id % 10 >= 8)
       |SELECT b.doc_id, any_value(b.n_spans) AS n_spans,
       |  CAST(sum(CASE WHEN h.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exact_dup,
       |  TRUE AS bloom_covers_exact
       |FROM b LEFT JOIN hist h ON b.span = h.span
       |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ source overlap
  /** Cross-source near-duplication matrix — the mixture-design telemetry a
    * curation team reads to see WHICH sources copy from each other (feeds
    * dedup priorities and per-source keep-rates, the
    * `source_mix_report`/`mixture_rebalance` family's pair-level
    * complement): MinHash-LSH candidate pairs (the `dedup_minhash_lsh`
    * pipeline verbatim — same signatures, banding, and 0.5 threshold)
    * rolled up by unordered source pair with pair counts and mean
    * estimated Jaccard.
    *
    * Shape at scale: the pair frame is ∝ near-dup density (banded, never
    * all-pairs); the two source lookups are doc_id-keyed joins against a
    * 2-column documents projection; output is ≤ |sources|² rows. The
    * least/greatest canonicalization makes the pair unordered without a
    * second aggregate.
    */
  def sourceOverlapMatrix(s: SparkSession, d: String): DataFrame = {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    lshPairs(s, d)
      .join(src.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(src.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(
        least(col("sa.source"), col("sb.source")).as("source_a"),
        greatest(col("sa.source"), col("sb.source")).as("source_b"),
        col("est_jaccard"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"),
        round(avg("est_jaccard"), 4).as("avg_est_jaccard"))
      .orderBy("source_a", "source_b")
  }

  val sourceOverlapMatrixSql: String =
    s"""WITH $lshPairsSqlCtes,
       |src AS (SELECT doc_id, source FROM documents)
       |SELECT least(sa.source, sb.source) AS source_a,
       |  greatest(sa.source, sb.source) AS source_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  round(avg(est_jaccard), 4) AS avg_est_jaccard
       |FROM lshpairs p
       |JOIN src sa ON p.doc_a = sa.doc_id
       |JOIN src sb ON p.doc_b = sb.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------ span provenance
  /** Hot-span provenance — WHERE the boilerplate lives: for every span
    * `dedup_spans` would treat as hot ([[SpanHotThreshold]]+ occurrences;
    * one threshold and one span definition with the removal pass), the
    * occurrence count, how many distinct documents and distinct SOURCES
    * carry it. A span syndicated across many sources is shared template
    * mass (dedup corpus-wide); a span hot inside one source is that
    * source's own boilerplate (tune the source or the span pass). The
    * drill-down behind `dedup_spans`' drop counts and the span-level
    * sibling of `source_overlap_matrix`. The fixture carries NO exact
    * full-document duplicates (verified at both SFs), so span
    * granularity is where provenance has signal.
    *
    * Shape at scale: the one tokenize+span pass, a doc_id-keyed join to
    * restore the source column, one span-keyed aggregate. Spans are
    * emitted as md5 — the compared frame must not carry corpus text.
    */
  def spanProvenance(s: SparkSession, d: String): DataFrame = {
    val spans = docSpans(s, d).select("doc_id", "span")
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    spans.join(src, "doc_id")
      .groupBy("span")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"),
        countDistinct("source").as("n_sources"))
      .filter(col("n_occurrences") >= SpanHotThreshold)
      .select(md5(col("span")).as("span_md5"),
        col("n_occurrences"), col("n_docs"), col("n_sources"))
      .orderBy("span_md5")
  }

  val spanProvenanceSql: String =
    s"""WITH $docSpansSqlCtes,
       |j AS (SELECT e.span, e.doc_id, d2.source
       |      FROM e JOIN documents d2 USING (doc_id))
       |SELECT md5(span) AS span_md5,
       |  CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
       |FROM j GROUP BY span HAVING count(*) >= $SpanHotThreshold
       |ORDER BY span_md5""".stripMargin

  // ------------------------------------------------------- split overlap
  /** Cross-split n-gram overlap audit — the lexical-leakage telemetry of
    * the NAIVE doc-keyed split ([[graft.operators.Relational.splitOf]],
    * one definition with `sample_split` and the leakage-safe split's
    * `naive_split` column): for each split pair, the distinct word
    * bigrams both sides contain and their Jaccard overlap in integer
    * basis points. This is the quantified version of WHY
    * `split_leakage_safe` exists — near-dup families straddling a naive
    * split show up here as shared gram mass between train and eval.
    *
    * Shape at scale: one tokenize pass into a distinct (split, gram)
    * relation; sizes and the three pair intersections are gram-keyed
    * aggregates of that relation; the dense pair grid (from the 3-row
    * size table) restores a pair even if its intersection is empty.
    */
  def splitGramOverlap(s: SparkSession, d: String): DataFrame = {
    Tables.tuneSession(s) // shingle arrays get exploded
    val grams = parallelize(s, Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(Relational.splitOf(col("doc_id")).as("split"),
        explode(array_distinct(
          Portable.shingles(Portable.tokens(col("text")), 2))).as("bg"))
      .distinct()
      .localCheckpoint()
    val sizes = grams.groupBy("split").agg(count(lit(1)).as("n"))
    val shared = grams.as("a").join(grams.as("b"),
        col("a.bg") === col("b.bg") && col("a.split") < col("b.split"))
      .groupBy(col("a.split").as("split_a"), col("b.split").as("split_b"))
      .agg(count(lit(1)).as("shared_grams"))
    sizes.as("sa").join(sizes.as("sb"), col("sa.split") < col("sb.split"))
      .select(col("sa.split").as("split_a"), col("sb.split").as("split_b"),
        col("sa.n").as("grams_a"), col("sb.n").as("grams_b"))
      .join(shared, Seq("split_a", "split_b"), "left")
      .select(col("split_a"), col("split_b"), col("grams_a"), col("grams_b"),
        coalesce(col("shared_grams"), lit(0L)).as("shared_grams"))
      .withColumn("jaccard_bp", expr(
        "(shared_grams * 10000) div greatest(grams_a + grams_b - shared_grams, 1L)"))
      .orderBy("split_a", "split_b")
  }

  val splitGramOverlapSql: String = {
    val sh2 = Portable.shinglesSql(2)
    val split = Relational.splitCaseSql(
      s"(${Portable.hash28Sql("doc_id::VARCHAR")} % 10)")
    s"""WITH d AS (
       |  SELECT $split AS split, string_split(text, ' ') AS w FROM documents),
       |g AS (SELECT DISTINCT split, unnest(list_distinct($sh2)) AS bg FROM d),
       |sz AS (SELECT split, count(*) AS n FROM g GROUP BY 1),
       |sh AS (
       |  SELECT a.split AS split_a, b.split AS split_b, count(*) AS shared_grams
       |  FROM g a JOIN g b ON a.bg = b.bg AND a.split < b.split
       |  GROUP BY 1, 2),
       |grid AS (
       |  SELECT sa.split AS split_a, sb.split AS split_b,
       |    sa.n AS grams_a, sb.n AS grams_b
       |  FROM sz sa JOIN sz sb ON sa.split < sb.split)
       |SELECT grid.split_a, grid.split_b,
       |  CAST(grams_a AS BIGINT) AS grams_a, CAST(grams_b AS BIGINT) AS grams_b,
       |  CAST(coalesce(sh.shared_grams, 0) AS BIGINT) AS shared_grams,
       |  CAST(coalesce(sh.shared_grams, 0) * 10000
       |    // greatest(grams_a + grams_b - coalesce(sh.shared_grams, 0), 1)
       |    AS BIGINT) AS jaccard_bp
       |FROM grid LEFT JOIN sh
       |  ON grid.split_a = sh.split_a AND grid.split_b = sh.split_b
       |ORDER BY grid.split_a, grid.split_b""".stripMargin
  }

  // ------------------------------------------------------------- decontamination
  /** Benchmark decontamination (train/eval overlap detection): training
    * docs sharing any word-trigram with the held-out pseudo-benchmark
    * split (doc_id % 97 = 0, deterministic) are reported with their
    * overlap size — the standard pretraining hygiene step before a corpus
    * ships. Scale shape: the benchmark gram set is tiny relative to the
    * corpus, so it is distinct'd and BROADCAST; training postings stream
    * through the hash map and the only wide exchange is the per-doc
    * aggregate. At 100 TB the benchmark side stays a broadcast (eval sets
    * are MBs); nothing is ever all-pairs.
    */
  def decontaminateNgram(s: SparkSession, d: String): DataFrame = {
    // one definition of the screen: the [[benchGramHashes]] broadcast set
    // and the [[ngramOverlapCounts]] seam (64-bit gram fingerprints — the
    // jaccardPairs discipline; the hash never reaches the output) are the
    // SAME code the per-source rollup and the streaming gate run, so the
    // batch query, `contamination_by_source`, and `streamDecontaminate`
    // cannot drift on what "shares an n-gram" means.
    Tables.tuneSession(s)
    ngramOverlapCounts(
      parallelize(s, Tables.documents(s, d).select(col("doc_id"), col("text")))
        .filter(col("doc_id") % 97 =!= 0),
      benchGramHashes(s, d))
      .orderBy("doc_id")
  }

  /** Per-source contamination report — [[decontaminateNgram]] rolled up to
    * the mixture level: for every source, how many of its train-split
    * documents share any n-gram with the benchmark split, the
    * contamination rate (basis points — integer arithmetic, the
    * [[graft.operators.TextAnalysis.qualityGopher]] no-rounding
    * discipline), and the total shared-gram mass. This is the artifact a
    * curation review actually reads: per-document flags say WHAT to drop,
    * this says WHICH SOURCES leak benchmarks and need upstream fixes.
    *
    * Shape at scale: the per-doc screen is the broadcast-bench pipeline
    * unchanged; the rollup adds one doc_id-keyed left join against the
    * 2-column source projection and a ≤|sources| aggregate. Docs with
    * zero overlap are kept by the left join + coalesce so rates have the
    * right denominator.
    */
  def contaminationBySource(s: SparkSession, d: String): DataFrame = {
    // the unordered seam + shared bench set: same screen as
    // decontaminateNgram without its presentation sort in the middle
    val counts = ngramOverlapCounts(
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 97 =!= 0),
      benchGramHashes(s, d))
    Tables.documents(s, d)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("source"))
      .join(counts, Seq("doc_id"), "left")
      .select(col("source"),
        coalesce(col("n_shared_grams"), lit(0L)).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("g") > 0).cast("long")).as("n_contaminated"),
        expr("sum(CAST(g > 0 AS LONG)) * 10000 div count(1)")
          .as("contamination_bp"),
        sum("g").as("sum_shared_grams"))
      .orderBy("source")
  }

  val contaminationBySourceSql: String =
    s"""WITH $gramsSqlCte,
       |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
       |train AS (SELECT doc_id, gram FROM grams WHERE doc_id % 97 <> 0),
       |cnt AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS g
       |  FROM train t JOIN bench b ON t.gram = b.gram GROUP BY 1),
       |per AS (
       |  SELECT d.source, coalesce(cnt.g, 0) AS g
       |  FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
       |  WHERE d.doc_id % 97 <> 0)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CAST(g > 0 AS INT)) AS BIGINT) AS n_contaminated,
       |  CAST(sum(CAST(g > 0 AS INT)) * 10000 // count(*) AS BIGINT)
       |    AS contamination_bp,
       |  CAST(sum(g) AS BIGINT) AS sum_shared_grams
       |FROM per GROUP BY source ORDER BY source""".stripMargin

  /** The benchmark gram-hash set [[decontaminateNgram]] screens against
    * (64-bit gram fingerprints, distinct'd — the broadcast side), exposed
    * so the streaming gate caches it once instead of re-deriving it per
    * micro-batch. */
  def benchGramHashes(s: SparkSession, d: String): DataFrame =
    gramSetDF(s, d)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .filter(col("doc_id") % 97 === 0)
      .select(xxhash64(col("gram")).as("g")).distinct()

  /** df-level seam of the decontamination screen: per-doc shared-gram
    * counts of ANY `(doc_id, text)` frame against a benchmark gram-hash
    * set (`g` column, broadcast) — the scoring half
    * [[graft.streaming.Streams.streamDecontaminate]] serves per
    * micro-batch. Same trigram extraction and 64-bit fingerprints as
    * [[decontaminateNgram]]. Docs with zero overlap emit no row (the
    * caller left-joins + coalesces for totality). Output UNORDERED.
    */
  def ngramOverlapCounts(docs: DataFrame, benchG: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array_distinct(
          Portable.shingles(Portable.tokens(col("text")), N))).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("g"))
      .join(broadcast(benchG), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))

  val decontaminateNgramSql: String =
    s"""WITH $gramsSqlCte,
       |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
       |train AS (SELECT doc_id, gram FROM grams WHERE doc_id % 97 <> 0)
       |SELECT t.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
       |FROM train t JOIN bench b ON t.gram = b.gram
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Embedding-space decontamination — the SEMANTIC complement of
    * [[decontaminateNgram]]: flag every training vector whose cosine to
    * any held-out eval vector reaches the threshold. Lexical overlap
    * misses paraphrase-level contamination; embedding closeness is how a
    * modern pipeline catches it. Eval set = the fixture's probe
    * convention (`vec_id % 100 = 0`); threshold 0.25 is
    * fixture-calibrated so both verdict branches carry rows at both SFs
    * (the [[TextAnalysis.qualityGopher]] discipline). Cosine is rounded
    * to 4 dp AFTER the max and BEFORE the threshold so both engines
    * agree at the boundary (the [[dedupEmbedding]] contract).
    *
    * Shape at scale: the eval set is bounded BY CONSTRUCTION — the
    * fixture's `% 100` eval convention alone grows with the corpus, so
    * the panel is additionally capped to the first [[DecontamProbeCap]]
    * eval ids (`vec_id < 100·cap`), the `SemdedupProbes` fixed-panel
    * discipline: the broadcast side is ≤ cap rows at ANY corpus size
    * instead of 1% of it (at the fixture SFs the cap is not binding, so
    * the oracle rows are unchanged; at ×100+ it is what keeps the
    * broadcast bounded). The corpus is scanned ONCE; the |train| × |eval|
    * dot products are embarrassingly parallel codegen'd `vec_dot` calls,
    * and the partial-max aggregate reduces the exchange to one row per
    * train vector. A REAL benchmark set is bounded by definition; this
    * cap enforces the same property on the fixture-derived stand-in. If
    * the eval set ever outgrew broadcast, the banded LSH/IVF routes in
    * [[Similarity]] replace the exact pass — the same exact-vs-banded
    * economics as the dedup family.
    */
  /** Max eval-panel size for [[decontaminateEmbedding]] — mirrored into
    * the oracle SQL, enforced in the plan (not just documented). */
  private val DecontamProbeCap = 200
  def decontaminateEmbedding(s: SparkSession, d: String): DataFrame = {
    graft.functions.VecFunctions.register(s)
    // nrm > 0 guard: an all-zero embedding would put NaN/Infinity into the
    // cosine, and NaN max/round/compare semantics differ between engines —
    // the guard (mirrored in the oracle SQL) makes the contract total
    // instead of assuming the fixture carries no zero vectors.
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), expr("vec_norm(embedding)").as("nrm"))
      .filter(col("nrm") > 0)
    val inPanel = col("vec_id") % 100 === 0 &&
      col("vec_id") < lit(100L * DecontamProbeCap)
    val probes = e.filter(inPanel)
    val train = parallelize(s, e.filter(!inPanel))
    train.as("t").crossJoin(broadcast(probes.as("q")))
      .select(col("t.vec_id").as("vec_id"),
        (expr("vec_dot(t.embedding, q.embedding)") / (col("t.nrm") * col("q.nrm")))
          .as("cos"))
      .groupBy("vec_id")
      .agg(round(max("cos"), 4).as("max_eval_cos"))
      .select(col("vec_id"), col("max_eval_cos"),
        (col("max_eval_cos") >= 0.25).as("contaminated"))
      .orderBy("vec_id")
  }

  val decontaminateEmbeddingSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |probes AS (SELECT * FROM e
      |  WHERE vec_id % 100 = 0 AND vec_id < ${100L * DecontamProbeCap} AND nrm > 0),
      |train AS (SELECT * FROM e
      |  WHERE NOT (vec_id % 100 = 0 AND vec_id < ${100L * DecontamProbeCap}) AND nrm > 0),
      |mc AS (
      |  SELECT t.vec_id,
      |    max(list_sum(list_transform(range(1, len(t.embedding) + 1),
      |        i -> CAST(t.embedding[i] AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE)))
      |      / (t.nrm * p.nrm)) AS mx
      |  FROM train t CROSS JOIN probes p GROUP BY 1)
      |SELECT vec_id, round(mx, 4) AS max_eval_cos,
      |  round(mx, 4) >= 0.25 AS contaminated
      |FROM mc ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------- clusters
  /** Transitive near-dup clusters: connected components over the LSH
    * candidate pairs (est_jaccard >= 0.5), labels = min doc_id reachable.
    * This is the step a real dedup pipeline runs after pair generation —
    * "keep one survivor per CLUSTER", since near-duplication is transitive
    * in practice (A~B, B~C ⇒ one retained doc, not two).
    *
    * Implementation: Pregel-style min-label propagation to a fixpoint. The
    * driver loop holds NO data — each iteration is a distributed join over
    * the pair graph (which is proportional to near-dup density, orders of
    * magnitude smaller than the corpus), `localCheckpoint` cuts the lineage
    * so plans stay flat, and the only driver-side value is the convergence
    * count. Iterations ∝ component diameter; near-dup clusters are
    * shallow (the 20-round cap is a safety net, not a tuning knob).
    */
  def dedupClusters(s: SparkSession, d: String): DataFrame =
    clusterLabels(s, d)
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), max("doc_id").as("max_doc_id"))
      .orderBy("cluster_id")

  /** Connected-component labels over the LSH candidate-pair graph:
    * one row per doc that appears in ANY near-dup pair, `label` = min
    * doc_id reachable. Docs in no pair are absent (callers treat them as
    * singleton clusters labelled by their own id). Shared by
    * [[dedupClusters]] (cluster census) and [[splitLeakageSafe]]
    * (cluster-keyed split assignment).
    */
  private def clusterLabels(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint
    val edges = lshPairs(s, d).select("doc_a", "doc_b")
    val sym = edges.union(
      edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    // seed with the one-hop minimum (min of self and direct neighbors) —
    // size-2/3 clusters, the common case, converge in one confirmation round
    var labels = sym.groupBy(col("doc_a").as("doc_id"))
      .agg(min(least(col("doc_a"), col("doc_b"))).as("label"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    val maxRounds = 20 // pointer jumping ⇒ O(log diameter): cap ≫ any real graph
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = sym.join(labels, col("doc_b") === col("doc_id"))
        .groupBy(col("doc_a")).agg(min("label").as("nbr_min"))
      // pointer jumping: also hop to the current label's own label, so long
      // chains collapse in O(log n) rounds, not O(diameter)
      val hop = labels.as("x")
        .join(labels.as("y"), col("x.label") === col("y.doc_id"))
        .select(col("x.doc_id").as("hop_id"), col("y.label").as("hop_label"))
      // the convergence flag is computed IN the round (new vs old label),
      // so counting movers is a filter on the checkpointed frame — no
      // prev-vs-next self-join per round
      val newLabel = least(col("label"),
        least(coalesce(col("nbr_min"), col("label")),
          coalesce(col("hop_label"), col("label"))))
      // the mover count rides the checkpoint materialization as an
      // observed metric instead of a separate filter+count job per round
      // (r17 — the JobProfile run showed the cluster family's warm time
      // is job-count-bound; at corpus scale the count job was a second
      // full read of the round's frame). getOrEmpty is polled because
      // the observation listener completes asynchronously right after
      // the checkpoint job; the count fallback keeps the loop correct
      // even if the metric never lands.
      val obs = org.apache.spark.sql.Observation()
      val next = labels
        .join(nbrMin, col("doc_id") === col("doc_a"), "left")
        .join(hop, col("doc_id") === col("hop_id"), "left")
        .select(col("doc_id"), newLabel.as("label"),
          (newLabel =!= col("label")).as("moved"))
        .observe(obs, coalesce(sum(col("moved").cast("long")), lit(0L)).as("n_moved"))
        .localCheckpoint()
      changed = org.apache.spark.sql.GraftBridge.observedLong(obs, "n_moved")(
        next.filter(col("moved")).count())
      unpersistLocalCheckpoint(labels) // superseded round's blocks
      labels = next.select("doc_id", "label")
      rounds += 1
    }
    unpersistLocalCheckpoint(sym)
    // never return silently-truncated components: wrong cluster labels are
    // worse than a loud failure
    if (changed > 0) throw new IllegalStateException(
      s"dedupClusters did not converge after $maxRounds rounds ($changed labels still moving)")
    labels
  }

  /** The ONE SQL definition of component labeling (symmetric closure →
    * transitive reach → min-label → corpus assignment with singleton
    * fallback), shared by every cluster-derived oracle so the labeling
    * rule cannot silently diverge between them. The SQL twin of
    * [[clusterLabels]] + [[labeledDocs]].
    */
  private val componentLabelsSqlCtes: String =
    """sym AS (
      |  SELECT doc_a AS a, doc_b AS b FROM lshpairs
      |  UNION SELECT doc_b, doc_a FROM lshpairs),
      |reach(a, b) AS (
      |  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
      |  UNION
      |  SELECT s.a, r.b FROM sym s JOIN reach r ON s.b = r.a),
      |labels AS (SELECT a AS doc_id, min(b) AS label FROM reach GROUP BY a),
      |assigned AS (
      |  SELECT d.doc_id, coalesce(l.label, d.doc_id) AS label,
      |    l.doc_id IS NOT NULL AS in_cluster
      |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)""".stripMargin

  val dedupClustersSql: String =
    s"""WITH RECURSIVE $lshPairsSqlCtes,
       |$componentLabelsSqlCtes
       |SELECT label AS cluster_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  max(doc_id) AS max_doc_id
       |FROM labels GROUP BY 1 ORDER BY cluster_id""".stripMargin

  /** Quality-aware survivor selection — keep the HIGHEST-quality member
    * of each near-dup cluster instead of the first (keep-first discards
    * a cleaner copy whenever the lowest doc_id happens to be the noisier
    * one; production dedup keeps the best representative). Per multi-doc
    * cluster: the kept member (argmax `quality_bp`, ties → min doc_id —
    * the [[TextAnalysis.textQuality]] integer formula, one definition),
    * its quality, and the cluster's worst quality — the gap column is
    * the evidence that keep-best ≠ keep-first.
    *
    * Shape at scale: the label frame is pair-density-sized; quality is a
    * per-row projection on the cluster members only (semi-joined corpus
    * scan); the argmax is a `max(struct(quality, −doc_id))` combinable
    * aggregate — partial+final hash agg, NO per-cluster window, nothing
    * corpus-wide but the member join.
    */
  def dedupKeepBest(s: SparkSession, d: String): DataFrame =
    keepBestTail(clusterLabels(s, d), qualityFrame(s, d))

  def dedupKeepBestFromLabels(s: SparkSession, d: String,
      dir: String): DataFrame = {
    graft.models.ModelManifest.validateAgainstCorpus(
      s, dir, "cluster_labels", d)
    keepBestTail(s.read.parquet(s"$dir/labels"), qualityFrame(s, d))
  }

  private def qualityFrame(s: SparkSession, d: String): DataFrame =
    TextAnalysis.withQualityCounts(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextAnalysis.qualityBpExpr.as("quality_bp"))

  private def keepBestTail(labels: DataFrame, q: DataFrame): DataFrame =
    labels
      .join(q, "doc_id")
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("quality_bp"), (-col("doc_id")).as("negid"))).as("best"),
        min("quality_bp").as("min_quality_bp"))
      .select(col("cluster_id"), col("n_docs"),
        (col("best.negid") * -1).as("kept_doc_id"),
        col("best.quality_bp").as("kept_quality_bp"),
        col("min_quality_bp"))
      .orderBy("cluster_id")

  val dedupKeepBestSql: String =
    s"""WITH RECURSIVE $lshPairsSqlCtes,
       |$componentLabelsSqlCtes,
       |qm AS (
       |  SELECT doc_id,
       |    len(string_split(text, ' ')) AS n,
       |    len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS nstop,
       |    len(list_distinct(string_split(text, ' '))) AS ndist
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, CAST(${TextAnalysis.QualityBpSqlFrag} AS BIGINT)
       |    AS quality_bp FROM qm),
       |j AS (
       |  SELECT l.label, q.doc_id, q.quality_bp
       |  FROM labels l JOIN q ON q.doc_id = l.doc_id),
       |r AS (
       |  SELECT label, doc_id, quality_bp,
       |    row_number() OVER (
       |      PARTITION BY label ORDER BY quality_bp DESC, doc_id) AS rn
       |  FROM j),
       |g AS (
       |  SELECT label, CAST(count(*) AS BIGINT) AS n_docs,
       |    min(quality_bp) AS min_quality_bp
       |  FROM j GROUP BY 1)
       |SELECT g.label AS cluster_id, g.n_docs,
       |  r.doc_id AS kept_doc_id, r.quality_bp AS kept_quality_bp,
       |  g.min_quality_bp
       |FROM g JOIN r ON r.label = g.label AND r.rn = 1
       |ORDER BY cluster_id""".stripMargin

  // ------------------------------------------------- leakage-safe split
  /** Cluster-aware train/val/test split: the 80/10/10 hash split of
    * `Relational.sampleSplit`, but keyed on the near-dup CLUSTER label
    * (min reachable doc_id over the LSH pair graph) instead of the doc id,
    * so a near-duplicate family can never straddle the train/eval
    * boundary — the leakage mode a doc-keyed split cannot prevent (a doc
    * in train with its near-copy in test inflates eval). Singletons label
    * as themselves, so their assignment is identical to the naive split.
    *
    * Per split: doc and cluster counts, how many docs sit in multi-doc
    * clusters, and `n_docs_rescued` — docs whose doc-keyed split would
    * have differed from their cluster's home, i.e. the leaks this
    * operator closed.
    *
    * Scale shape: the label frame is proportional to near-dup density
    * (pairs, not corpus), so the corpus-side cost is one left join against
    * it — broadcast-by-threshold at real scale — after which every row's
    * split is decided row-locally by the portable hash; the per-split
    * audit aggregate is the only corpus-wide exchange (count-distinct is
    * the standard two-phase partial_count plan).
    */
  /** Every document with its cluster label (singletons label as
    * themselves) and whether it sits in a multi-doc near-dup cluster.
    * The corpus-side cost is one left join against the
    * pair-density-sized label frame — shared by [[splitLeakageSafe]]
    * and [[dedupSoftWeights]].
    */
  private def labeledDocs(s: SparkSession, d: String): DataFrame =
    labeledFrom(Tables.documents(s, d).select("doc_id"), clusterLabels(s, d))

  /** Every document with the size of its near-dup cluster (singletons →
    * 1) — the per-doc multiplicity signal the selection-report query
    * joins next to quality and DSIR weight. One corpus-side label join +
    * an O(clusters) size aggregate joined back on the label. */
  private[operators] def docClusterSizes(s: SparkSession, d: String): DataFrame = {
    val labeled = labeledDocs(s, d)
    labeled.join(
        labeled.groupBy("label").agg(count(lit(1)).as("cluster_size")),
        "label")
      .select(col("doc_id"), col("cluster_size"))
  }

  /** The `assigned`+`sizes` SQL twin of [[docClusterSizes]] (requires the
    * lshpairs + component-label CTEs in scope). */
  private[operators] val docClusterSizesSqlCtes: String =
    """sizes AS (SELECT label, count(*) AS cluster_size
      |          FROM assigned GROUP BY 1),
      |docsizes AS (
      |  SELECT a.doc_id, s.cluster_size
      |  FROM assigned a JOIN sizes s ON a.label = s.label)""".stripMargin

  /** The cluster-labeling CTE chains, exposed for cross-module oracle
    * composition (the selection report joins dedup, quality, and DSIR
    * signals in ONE query — its oracle reuses these verbatim). A `def`:
    * `componentLabelsSqlCtes` is declared later in this object, and a
    * `val` here would capture it before initialization. */
  private[operators] def pairsAndLabelsSqlCtes: String =
    s"$lshPairsSqlCtes,\n$componentLabelsSqlCtes"

  /** Corpus ⟕ labels with the singleton fallback — shared by the
    * in-memory path ([[labeledDocs]]) and the persisted-label serving
    * path ([[labeledDocsFromIndex]]). */
  private def labeledFrom(docIds: DataFrame, labels: DataFrame): DataFrame =
    docIds
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("label"),
        col("label").isNotNull.as("in_cluster"))

  // ------------------------------------------- persisted cluster labels
  /** Persist the near-dup component labels — the cluster family's
    * train-offline/serve-online split: pair generation + label
    * propagation is the expensive multi-pass job (the slowest family in
    * the bench), and FOUR consumers re-derive it per invocation
    * (`dedup_clusters`, `split_leakage_safe`, `dedup_soft_weights`,
    * `dedup_keep_best`). A 100 TB pipeline labels once per corpus
    * version and serves every downstream read from the pair-density-
    * sized artifact; the `FromLabels` variants below read ONLY the
    * corpus (one projection) + this parquet — no shingles, no pair
    * join, no propagation (plan-pinned by `ClusterLabelsSpec`).
    */
  def writeClusterLabels(s: SparkSession, d: String, dir: String): Unit = {
    graft.models.ModelManifest.invalidate(s, dir)
    clusterLabels(s, d).write.mode("overwrite").parquet(s"$dir/labels")
    graft.models.ModelManifest.write(s, dir, "cluster_labels", d,
      Seq("documents"))
  }

  private def labeledDocsFromIndex(s: SparkSession, d: String,
      dir: String): DataFrame = {
    // labels are positional facts about THIS corpus version: a changed
    // corpus makes every downstream split/weight silently wrong — gate it
    graft.models.ModelManifest.validateAgainstCorpus(
      s, dir, "cluster_labels", d)
    labeledFrom(Tables.documents(s, d).select("doc_id"),
      s.read.parquet(s"$dir/labels"))
  }

  def splitLeakageSafe(s: SparkSession, d: String): DataFrame =
    splitTail(labeledDocs(s, d))

  def splitLeakageSafeFromLabels(s: SparkSession, d: String,
      dir: String): DataFrame =
    splitTail(labeledDocsFromIndex(s, d, dir))

  private def splitTail(labeled: DataFrame): DataFrame = {
    // the ONE 80/10/10 rule — naive_split is only a meaningful audit while
    // it stays bit-identical to sampleSplit's assignment
    import Relational.splitOf
    labeled
      .select(col("doc_id"), col("label"), col("in_cluster"),
        splitOf(col("label")).as("split"),
        splitOf(col("doc_id")).as("naive_split"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("label")).as("n_clusters"),
        sum(when(col("in_cluster"), 1L).otherwise(0L)).as("n_neardup_docs"),
        sum(when(col("split") =!= col("naive_split"), 1L).otherwise(0L))
          .as("n_docs_rescued"))
      .orderBy("split")
  }

  val splitLeakageSafeSql: String = {
    def h(e: String) = graft.functions.Portable.hash28Sql(e)
    s"""WITH RECURSIVE $lshPairsSqlCtes,
       |$componentLabelsSqlCtes,
       |buckets AS (
       |  SELECT doc_id, label, in_cluster,
       |    ${h("label::VARCHAR")} % 10 AS cb,
       |    ${h("doc_id::VARCHAR")} % 10 AS nb
       |  FROM assigned),
       |marked AS (
       |  SELECT doc_id, label, in_cluster,
       |    ${Relational.splitCaseSql("cb")} AS split,
       |    ${Relational.splitCaseSql("nb")} AS naive_split
       |  FROM buckets)
       |SELECT split,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT label) AS BIGINT) AS n_clusters,
       |  CAST(sum(CASE WHEN in_cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_docs,
       |  CAST(sum(CASE WHEN split <> naive_split THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_rescued
       |FROM marked GROUP BY 1 ORDER BY split""".stripMargin
  }

  // ------------------------------------------------------- soft dedup
  /** Soft dedup — the down-WEIGHT alternative to dropping near-dups: each
    * doc gets sampling weight `1 / |its cluster|`, so a family of five
    * near-copies contributes one document's worth of probability mass to
    * a training mix instead of five (hard dedup's keep-one-survivor is
    * the `weight ∈ {0, 1}` special case; soft weighting keeps intra-
    * family variation available while removing the multiplicity bias).
    * Reported as the cluster-size histogram a curation run reads:
    * per size, how many clusters and docs, the per-doc weight, and the
    * total retained mass — whose grand total equals the number of
    * clusters, i.e. the corpus "effective size" after weighting.
    *
    * Scale shape: [[labeledDocs]]' one corpus-side left join, then a
    * count per label (partial+final, O(clusters) out) and the tiny
    * histogram aggregate — no new corpus exchange beyond the label join.
    */
  def dedupSoftWeights(s: SparkSession, d: String): DataFrame =
    softWeightsTail(labeledDocs(s, d))

  def dedupSoftWeightsFromLabels(s: SparkSession, d: String,
      dir: String): DataFrame =
    softWeightsTail(labeledDocsFromIndex(s, d, dir))

  private def softWeightsTail(labeled: DataFrame): DataFrame =
    labeled
      .groupBy("label").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
        (count(lit(1)) * col("cluster_size")).as("n_docs"))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        round(lit(1.0) / col("cluster_size"), 6).as("doc_weight"),
        // per size bucket, retained mass = n_clusters by definition: each
        // cluster contributes exactly one document's worth of mass
        col("n_clusters").cast("double").as("retained_mass"))
      .orderBy("cluster_size")

  val dedupSoftWeightsSql: String =
    s"""WITH RECURSIVE $lshPairsSqlCtes,
       |$componentLabelsSqlCtes,
       |sizes AS (SELECT label, count(*) AS cluster_size FROM assigned GROUP BY 1)
       |SELECT cluster_size,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(count(*) * cluster_size AS BIGINT) AS n_docs,
       |  round(1.0 / cluster_size, 6) AS doc_weight,
       |  -- per size bucket, retained mass = n_clusters by definition:
       |  -- each cluster contributes exactly one document's worth of mass
       |  CAST(count(*) AS DOUBLE) AS retained_mass
       |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  // ------------------------------------------------------------- embedding
  /** Embedding-cosine near-dup pairs (cosine >= 0.4, double precision,
    * rounded before thresholding so both engines agree at the boundary).
    * Norms are computed once per vector before the pair join; the per-pair
    * dot product is the codegen'd native `vec_dot` expression
    * (`graft.functions.FloatVecDot`) — the interpreted higher-order-function
    * formulation was 40× slower at the same semantics.
    */
  def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    graft.functions.VecFunctions.register(s)
    val e = parallelize(s, Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"), expr("vec_norm(embedding)").as("nrm"))
    // stream the repartitioned side so the O(n²) dot products use every
    // core; broadcast the other (n × (8B + 256B + 8B) — well under the bar)
    e.as("p").join(broadcast(e.as("q")), col("p.vec_id") < col("q.vec_id"))
      .select(col("p.vec_id").as("vec_a"), col("q.vec_id").as("vec_b"),
        round(expr("vec_dot(p.embedding, q.embedding)") / (col("p.nrm") * col("q.nrm")), 4)
          .as("cosine"))
      .filter(col("cosine") >= 0.4)
      .orderBy("vec_a", "vec_b")
  }

  val dedupEmbeddingSql: String =
    """WITH pairs AS (
      |  SELECT p.vec_id AS vec_a, q.vec_id AS vec_b,
      |    round(
      |      list_sum(list_transform(range(1, len(p.embedding) + 1),
      |        i -> CAST(p.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(p.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      |      4) AS cosine
      |  FROM embeddings p JOIN embeddings q ON p.vec_id < q.vec_id)
      |SELECT vec_a, vec_b, cosine FROM pairs
      |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  // ------------------------------------------------------------ winnowing
  /** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
    * algorithm): hash every k=16-char window, slide a w=25-hash window
    * over the sequence, keep each window's minimum — the classic LOCAL
    * fingerprinting scheme with a hard guarantee: any two documents
    * sharing an exact substring of ≥ w+k−1 = 40 characters share at least
    * one selected fingerprint. This is the character-level exact-substring
    * detector next to the word-gram span family (`dedup_spans` needs 5
    * aligned TOKENS; this fires on any 40-char run — attribution lines,
    * template fragments, quoted passages that tokenize differently).
    *
    * One scan, all per-row array expressions (position hashes + window
    * minima — O(len·w) comparisons inside codegen, no shuffle), then the
    * posting-list tail: explode distinct fingerprints, group them into
    * per-fingerprint posting lists, drop corpus-hot fingerprints
    * (posting length ≥ 16 — site boilerplate carries no dedup signal,
    * and on this low-entropy fixture the cap genuinely bites), emit each
    * posting's doc pairs in-row, per-pair shared count ≥ 3. Unlike
    * the jaccard stop-gram cap (a Spark-side optimization below the
    * oracle's notice), the hot cap here is PART OF THE CONTRACT and the
    * SQL mirror applies the identical deterministic rule. Hashes are the
    * 28-bit md5-derived portable family, identical in the SQL mirror.
    */
  def dedupWinnow(s: SparkSession, d: String): DataFrame =
    winnowPairs(
      parallelize(s, Tables.documents(s, d).select(col("doc_id"), col("text"))))
      .orderBy("doc_a", "doc_b")

  /** The df-level winnowing pipeline over any `(doc_id, text)` frame —
    * the seam the spec drives with planted substring pairs; `minShared`
    * is the reporting floor (1 exercises the bare guarantee). */
  // All three interpolated (with their derived offsets) into BOTH SQL
  // mirrors below, so tuning any of them cannot desync the operator from
  // its oracle — the discipline WinnowMinShared already had.
  private val WinnowK = 16
  private val WinnowW = 25
  // private[graft] so CorpusHealthSpec's plain-JVM recompute and fixture
  // sizing reference the production cap instead of a literal that would
  // silently diverge on a retune (ADVICE r16)
  private[graft] val WinnowHotCap = 16
  /** The winnow report floor (shared fingerprints to count as a match) —
    * ONE definition interpolated into both SQL mirrors and used by the
    * pair query, the serving screen, and the substring screen, so tuning
    * it cannot desynchronize batch detection from streaming serving
    * (review finding: it existed as five independent literals). */
  private val WinnowMinShared = 3

  /** The hot-cap as a BUFFER bound (VERDICT r15 item 1): one shared
    * size-capped distinct-collect whose per-group state is ≤ cap−1 longs
    * no matter how hot the fingerprint — a corpus-wide boilerplate fp
    * overflows to an empty posting instead of materializing an O(corpus)
    * array in one aggregation buffer the way collect_list-then-filter
    * did. Overflow ⇒ empty array ⇒ identical downstream semantics to
    * `size(docs) < WinnowHotCap` (empty fails `size >= 2` and explodes to
    * nothing); output is sorted, replacing the explicit `array_sort`. */
  private lazy val cappedDocs =
    udaf(new graft.functions.CappedCollectSetAggregator(WinnowHotCap),
      org.apache.spark.sql.Encoders.scalaLong)

  /** Winnowed fingerprint stream (doc_id, fp) for any `(doc_id, text)`
    * frame — the shared front half of [[winnowPairs]], the index builder
    * [[writeWinnowIndex]] and the screen [[winnowScreenBatch]], so the
    * batch query, the persisted index, and the serving path can never
    * select different fingerprints. Hot-cap NOT applied here (each
    * consumer applies its own posting rule). */
  private[graft] def winnowFingerprints(input: DataFrame): DataFrame = {
    val k = WinnowK; val w = WinnowW
    // Entirely per-row, via the NATIVE [[graft.functions.WinnowFingerprints]]
    // expression (r15): value-identical to the declarative
    // md5/conv/slice/array_min formulation it replaces — the same 28-bit
    // md5-derived portable hashes the SQL mirrors recompute — but one
    // tight loop with a reused digest and a monotonic-deque sliding
    // minimum. The ×100 bisection (WinnowDebug) attributed ~95% of
    // dedup_winnow's wall time to the old form's interpreted per-window
    // `slice` allocations and hex-string parsing; the plan shape is
    // unchanged (nothing shuffles, only the ~len/w distinct fingerprints
    // leave the row) and the no-window/no-posexplode pin still holds.
    import org.apache.spark.sql.GraftBridge.{column, expression}
    input
      .filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"),
        explode(column(graft.functions.WinnowFingerprints(
          expression(col("text")), k, w))).as("fp"))
  }

  /** Winnowed candidate pairs over any `(doc_id, text)` frame.
    *
    * The pair stage is POSTING-LIST pair generation, not a self-join
    * (VERDICT r14 item 1 — the fps-explode exchange carried ~40
    * (fp, doc_id) pairs per doc and the equi-self-join re-shuffled them
    * twice more, the board's most expensive exchange mass at ×300): the
    * ~len/w fingerprints per doc shuffle ONCE into a size-capped
    * distinct-collect ([[graft.functions.CappedCollectSetAggregator]] —
    * per-group buffer hard-bounded at hotCap−1 longs, so a corpus-wide
    * boilerplate fp overflows to empty instead of materializing an
    * O(corpus) posting array; ≡ the old count ≥ cap anti-join, since each
    * doc's fingerprints are row-distinct and overflow ⇔ corpus count ≥
    * cap), and candidate pairs
    * are emitted INSIDE the row by a sorted-array double-transform
    * (≤ C(cap−1, 2) = 105 pairs per fingerprint, pure codegen). What
    * used to be a localCheckpoint + hot-count exchange + two-sided
    * self-join exchange is now one fp-keyed exchange plus the pair-count
    * exchange — no join operator anywhere in the plan.
    */
  private[graft] def winnowPairs(input: DataFrame, minShared: Int = WinnowMinShared): DataFrame =
    winnowFingerprints(input)
      .groupBy("fp")
      .agg(cappedDocs(col("doc_id")).as("docs"))
      .filter(size(col("docs")) >= 2)
      .select(explode(expr(
        """flatten(transform(docs, (a, i) ->
          |  transform(slice(docs, i + 2, size(docs)),
          |    b -> named_struct('doc_a', a, 'doc_b', b))))"""
          .stripMargin.replace("\n", " "))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** The hot-capped RETAINED `(doc_id, fp)` set of a fingerprint frame —
    * the [[winnowPairs]] retention rule as one fp-keyed exchange (posting
    * lists, size-capped in the buffer, re-exploded) instead of the old
    * localCheckpoint + hot-count + anti-join triple. Shared by the index
    * builder, the grow-screen's history half, and compaction, so the
    * three consumers of "retained" can never apply different cap rules. */
  private def retainedFps(fp: DataFrame): DataFrame =
    fp.groupBy("fp").agg(cappedDocs(col("doc_id")).as("docs"))
      .select(explode(col("docs")).as("doc_id"), col("fp"))

  /** Persist the corpus's retained winnow fingerprints (hot-capped, the
    * [[winnowPairs]] rule) as the substring-dedup screen index — the
    * train-offline half of the winnow family's serving split, the
    * `writeDedupIndex`/`writeSemdedupIndex` discipline. |index| is
    * O(corpus positions / w) rows of two longs. */
  def writeWinnowIndex(s: SparkSession, d: String, dir: String): Unit = {
    writeWinnowIndex(
      parallelize(s, Tables.documents(s, d).select(col("doc_id"), col("text"))),
      dir)
    // overwrite the frame-level manifest with the corpus-versioned one
    graft.models.ModelManifest.write(s, dir, "winnow_index", d,
      Seq("documents"),
      Seq("k" -> WinnowK.toString, "w" -> WinnowW.toString,
        "hot_cap" -> WinnowHotCap.toString))
  }

  /** Frame-level overload: index any `(doc_id, text)` corpus slice — the
    * curation smoke indexes only the held-out split this way. The
    * manifest records the slice as unversioned (no table fingerprint
    * exists for an arbitrary frame); kind/params validation still
    * applies at serve time. */
  def writeWinnowIndex(docs: DataFrame, dir: String): Unit = {
    graft.models.ModelManifest.invalidate(docs.sparkSession, dir)
    retainedFps(winnowFingerprints(docs))
      .write.mode("overwrite").parquet(s"$dir/fps")
    graft.models.ModelManifest.write(docs.sparkSession, dir, "winnow_index",
      "<frame>", Nil,
      Seq("k" -> WinnowK.toString, "w" -> WinnowW.toString,
        "hot_cap" -> WinnowHotCap.toString))
  }

  /** The validated read half of the winnow serving split — every consumer
    * of a persisted winnow index (streaming screen, smoke) loads through
    * here, so a wrong or schema-drifted artifact fails before any join. */
  def winnowIndexFps(s: SparkSession, dir: String): DataFrame = {
    graft.models.ModelManifest.validate(s, dir, "winnow_index")
    s.read.parquet(s"$dir/fps")
  }

  /** Screen a batch of `(doc_id, text)` rows against a persisted winnow
    * index: fingerprints of the ARRIVING docs only (the index is never
    * recomputed), joined on the fingerprint key; a doc sharing ≥ 3
    * retained fingerprints with history is a substring-duplicate
    * suspect. TOTAL: docs too short to fingerprint (or with no index
    * hit) surface with 0 hits, never dropped. Output UNORDERED (the
    * serving contract). */
  def winnowScreenBatch(batch: DataFrame, indexFps: DataFrame): DataFrame = {
    val hits = winnowFingerprints(batch)
      .join(indexFps.select(col("fp"), col("doc_id").as("src_doc")), "fp")
      .filter(col("src_doc") =!= col("doc_id")) // self-match guard on re-screen
      .groupBy("doc_id").agg(countDistinct("fp").as("n_index_hits"))
    batch.select(col("doc_id"), col("text"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_index_hits"), lit(0L)).as("n_index_hits"),
        (coalesce(col("n_index_hits"), lit(0L)) >= WinnowMinShared).as("suspect"))
  }

  /** Oracle-closed registered form of the GROWN winnow screen
    * (`Streams.streamWinnowScreenGrow` semantics as one relational
    * composition): history documents (doc_id % 3 != 0) form the
    * hot-capped base index, the % 6 = 0 docs are the already-arrived
    * append batch — fingerprinted UNCAPPED, exactly the per-batch append
    * contract — and the % 6 = 3 docs are the arriving batch being
    * screened (the % 6 = 3 slice is excluded from the index: the stream
    * has not seen it yet). A doc quoting an APPENDED doc is a suspect
    * only via the growth half, so an engine that screens against the
    * frozen base alone flips those rows of the count/hash compare. The
    * DuckDB oracle recomputes the winnow fingerprints and both index
    * halves by brute force. */
  def winnowGrowScreen(s: SparkSession, d: String): DataFrame = {
    val docs = parallelize(s,
      Tables.documents(s, d).select(col("doc_id"), col("text")))
      .localCheckpoint() // feeds three fingerprint passes + the probe rows
    val idx = retainedFps(winnowFingerprints(docs.filter(col("doc_id") % 3 =!= 0)))
      .unionByName(winnowFingerprints(docs.filter(col("doc_id") % 6 === 0))
        .select("doc_id", "fp"))
    winnowScreenBatch(docs.filter(col("doc_id") % 6 === 3), idx)
      .orderBy("doc_id")
  }

  val winnowGrowScreenSql: String =
    s"""WITH h AS (
      |  SELECT doc_id,
      |    CASE WHEN length(text) >= ${WinnowK + WinnowW - 1}
      |      THEN list_transform(range(1, length(text) - ${WinnowK - 2}),
      |        i -> ('0x' || substring(md5(substring(text, CAST(i AS INTEGER), $WinnowK)), 1, 7))::BIGINT)
      |      ELSE [] END AS hs
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) >= $WinnowW
      |      THEN list_distinct(list_transform(range(1, len(hs) - ${WinnowW - 2}),
      |        j -> list_min(hs[j:j+${WinnowW - 1}])))
      |      ELSE [] END AS fps
      |  FROM h),
      |e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
      |hist AS (SELECT * FROM e WHERE doc_id % 3 <> 0),
      |hot AS (SELECT fp FROM hist GROUP BY fp HAVING count(*) >= $WinnowHotCap),
      |idx AS (
      |  SELECT fp FROM hist WHERE fp NOT IN (SELECT fp FROM hot)
      |  UNION ALL
      |  SELECT fp FROM e WHERE doc_id % 6 = 0),
      |hits AS (
      |  SELECT p.doc_id, CAST(count(DISTINCT p.fp) AS BIGINT) AS n_index_hits
      |  FROM (SELECT * FROM e WHERE doc_id % 6 = 3) p
      |  JOIN idx i ON p.fp = i.fp
      |  GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(n_index_hits, 0) AS BIGINT) AS n_index_hits,
      |  coalesce(n_index_hits, 0) >= $WinnowMinShared AS suspect
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 6 = 3) d
      |LEFT JOIN hits USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Offline compaction for a winnow index grown by
    * `Streams.streamWinnowScreenGrow`: folds the appended per-batch
    * fingerprint trees into the base relation and RE-APPLIES the global
    * hot cap — hotness is a CORPUS-level property the per-batch appends
    * cannot see (boilerplate arriving spread over many batches passes
    * every per-batch view, but must drop once its total count crosses
    * [[WinnowHotCap]]), so only this fold can re-establish the
    * [[winnowPairs]] retention rule over the grown corpus. The cap is
    * applied to the RETAINED set: a fingerprint the base build already
    * capped stays gone. Same manifest invalidate-first / rewrite-last
    * bracket and staged-rename swap as the edit/ANN compactions
    * (`models.IndexMaintenance`); no-op when nothing was appended. */
  def compactWinnowIndex(s: SparkSession, dir: String): Unit = {
    val m = graft.models.ModelManifest.validate(s, dir, "winnow_index")
    if (!graft.models.IndexMaintenance.exists(s, s"$dir/appended")) return
    // cappedDocs IS the distinct: the fold's (doc_id, fp) dedup and the
    // size-bounded posting cap ride the SAME fp-keyed exchange
    val merged = s.read.parquet(s"$dir/fps").select("doc_id", "fp")
      .unionByName(s.read.parquet(s"$dir/appended").select("doc_id", "fp"))
      .groupBy("fp").agg(cappedDocs(col("doc_id")).as("docs"))
      .select(explode(col("docs")).as("doc_id"), col("fp"))
    graft.models.ModelManifest.invalidate(s, dir)
    graft.models.IndexMaintenance.stagedSwap(s, dir, "fps",
      Seq("appended")) { staged =>
      merged.write.mode("overwrite").parquet(staged)
    }
    graft.models.ModelManifest.write(s, dir, "winnow_index", m.sourceDir,
      m.tables, graft.models.IndexMaintenance.bumpCompactions(m))
  }

  val dedupWinnowSql: String =
    s"""WITH h AS (
      |  SELECT doc_id,
      |    CASE WHEN length(text) >= ${WinnowK + WinnowW - 1}
      |      THEN list_transform(range(1, length(text) - ${WinnowK - 2}),
      |        i -> ('0x' || substring(md5(substring(text, CAST(i AS INTEGER), $WinnowK)), 1, 7))::BIGINT)
      |      ELSE [] END AS hs
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) >= $WinnowW
      |      THEN list_distinct(list_transform(range(1, len(hs) - ${WinnowW - 2}),
      |        j -> list_min(hs[j:j+${WinnowW - 1}])))
      |      ELSE [] END AS fps
      |  FROM h),
      |e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
      |hot AS (SELECT fp FROM e GROUP BY fp HAVING count(*) >= $WinnowHotCap),
      |r AS (SELECT * FROM e WHERE fp NOT IN (SELECT fp FROM hot)),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM r a JOIN r b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, n_shared FROM p
      |WHERE n_shared >= $WinnowMinShared ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------- substring decontamination
  /** Substring-level benchmark decontamination: winnow fingerprints of
    * the held-out split (the same `doc_id % 97 = 0` eval set
    * [[decontaminateNgram]] uses) broadcast against the training side —
    * training documents sharing ≥ 1 fingerprint (any exact ≥ 40-char
    * run) are reported, contaminated at ≥ 3. The char-level complement
    * of the token-trigram screen: it fires on verbatim quotes whose
    * tokenization differs (whitespace, casing inside the run, attached
    * punctuation).
    *
    * Scale shape = [[decontaminateNgram]]'s: the eval-set fingerprints
    * broadcast (|eval| is bounded by design), one corpus fingerprint
    * pass, per-doc count aggregate. Output mirrors the n-gram screen:
    * only overlapping docs (consumers left-join + coalesce for
    * totality).
    */
  def decontaminateSubstring(s: SparkSession, d: String): DataFrame = {
    val fps = winnowFingerprints(
      parallelize(s, Tables.documents(s, d).select(col("doc_id"), col("text"))))
      .localCheckpoint() // read by both split sides
    val bench = fps.filter(col("doc_id") % 97 === 0).select("fp").distinct()
    val train = fps.filter(col("doc_id") % 97 =!= 0)
    train.join(broadcast(bench), Seq("fp"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_fps"))
      .withColumn("contaminated", col("n_shared_fps") >= WinnowMinShared)
      .orderBy("doc_id")
  }

  val decontaminateSubstringSql: String =
    s"""WITH h AS (
      |  SELECT doc_id,
      |    CASE WHEN length(text) >= ${WinnowK + WinnowW - 1}
      |      THEN list_transform(range(1, length(text) - ${WinnowK - 2}),
      |        i -> ('0x' || substring(md5(substring(text, CAST(i AS INTEGER), $WinnowK)), 1, 7))::BIGINT)
      |      ELSE [] END AS hs
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) >= $WinnowW
      |      THEN list_distinct(list_transform(range(1, len(hs) - ${WinnowW - 2}),
      |        j -> list_min(hs[j:j+${WinnowW - 1}])))
      |      ELSE [] END AS fps
      |  FROM h),
      |e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
      |bench AS (SELECT DISTINCT fp FROM e WHERE doc_id % 97 = 0),
      |train AS (SELECT doc_id, fp FROM e WHERE doc_id % 97 <> 0)
      |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared_fps,
      |  count(*) >= $WinnowMinShared AS contaminated
      |FROM train t JOIN bench b USING (fp)
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // ------------------------------------------------------------ containment
  /** Asymmetric n-gram containment — C(A→B) = |grams A ∩ grams B| / |grams A|
    * — the quote/subset detector symmetric Jaccard misses: a short document
    * wholly embedded in a long one scores near-zero Jaccard (the union is
    * dominated by the long doc) but containment 1.0. Standard next to
    * MinHash in dedup stacks (containment search à la suffix filtering).
    *
    * Same inverted index as [[jaccardPairs]] (stop-gram cap, xxhash64
    * gram keys), then both directed ratios per pair; a pair is emitted
    * when either direction ≥ 0.9 on the 4-dp-rounded value, so the
    * oracle's identical rounding cannot disagree at the threshold.
    *
    * Candidate stage (r17): the emission test
    * greatest(inter/na, inter/nb) ≥ 0.9 is inter ≥ 0.89995·min(na,nb)
    * after rounding, so a DIRECTED prefix filter is lossless even though
    * containment admits no size-ratio filter: for each pair, the SMALLER
    * document must share ≥ α = ⌈τ·n_small⌉ grams, hence its first
    * n − ⌈τ·n⌉ + 1 grams in the canonical (hash) order must contain a
    * shared gram (prefix-filter lemma) — the larger side stays
    * unfiltered, which is exactly the asymmetry that blocks a symmetric
    * ppjoin prefix. The equi-join therefore indexes only each doc's ~10%
    * prefix against the full stream (ordering predicate n_a < n_b, doc_id
    * tiebreak, picks the smaller side's prefix exactly once per pair),
    * with the same per-row-lossless positional bound as
    * [[jaccardCandidates]]: min(pa,pb) + 1 + min(na−pa−1, nb−pb−1) ≥ α.
    * Verify re-derives the exact inter on the full sorted arrays with
    * [[graft.functions.SortedLongIntersectCount]] — value-identical to
    * the former gram-pair groupBy count (arrays are distinct by
    * construction), so the output is bit-for-bit the oracle's.
    *
    * Measured ×100 (r17 drill, unchanged-jaccard control in band):
    * t_big 28.75 → 15.20 s, exponent 0.585 → 0.36.
    *
    * SCALE CONTRACT: exact verify remains a ≤×300 tool (pre-prefix it
    * measured 100.9 s at ×300 and was spill-bound at ×1000: 373.9 s only
    * when run alone with the full scratch disk; the r17 prefix cuts the
    * pair shuffle ~10× but the verify is still exact/quadratic in the
    * surviving candidates). Past ×300 use [[dedupMinhashLsh]] to generate
    * candidates and this operator's verify to confirm them.
    */
  /** Prefix threshold just UNDER the 0.89995 rounding boundary (same
    * float-margin rule as [[JaccardTau]]). */
  private val ContainTau = 0.8999

  def dedupContainment(s: SparkSession, d: String): DataFrame =
    containmentPairs(gramSetDF(s, d))

  /** The df-level containment pipeline over any `(doc_id, grams)` frame —
    * the seam `ContainmentProps` drives with random planted-subset
    * corpora to prove the directed prefix filter lossless. */
  private[graft] def containmentPairs(gramSets: DataFrame): DataFrame = {
    val docsArr = jaccardDocArrays(retainedGrams(gramSets))
    val full = docsArr.select(col("doc_id"), col("n"),
      posexplode(col("gs")).as(Seq("p", "g")))
    val prefix = docsArr.select(col("doc_id"), col("n"),
      posexplode(slice(col("gs"), lit(1),
        (col("n") - ceil(col("n") * ContainTau) + lit(1)).cast("int")))
        .as(Seq("p", "g")))
    val alpha = ceil(col("a.n") * ContainTau)
    val cands = prefix.as("a").join(full.as("b"),
        col("a.g") === col("b.g") &&
          (col("a.n") < col("b.n") ||
            (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))) &&
          least(col("a.p"), col("b.p")) + 1 +
            least(col("a.n") - col("a.p") - 1, col("b.n") - col("b.p") - 1)
            >= alpha)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    cands
      .join(docsArr.hint("shuffle_hash").select(col("doc_id").as("doc_a"),
        col("gs").as("ga"), col("n").as("na")), Seq("doc_a"))
      .join(docsArr.hint("shuffle_hash").select(col("doc_id").as("doc_b"),
        col("gs").as("gb"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        {
          import org.apache.spark.sql.GraftBridge.{column, expression}
          column(graft.functions.SortedLongIntersectCount(
            expression(col("ga")), expression(col("gb"))))
            .cast("double").as("inter")
        },
        col("na"), col("nb"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / col("na"), 4).as("containment_a"),
        round(col("inter") / col("nb"), 4).as("containment_b"))
      .filter(greatest(col("containment_a"), col("containment_b")) >= 0.9)
      .orderBy("doc_a", "doc_b")
  }

  val dedupContainmentSql: String =
    s"""WITH $gramsSqlCte,
       |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM grams a JOIN grams b
       |    ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |c AS (
       |  SELECT doc_a, doc_b,
       |    round(CAST(inter AS DOUBLE) / sa.n, 4) AS containment_a,
       |    round(CAST(inter AS DOUBLE) / sb.n, 4) AS containment_b
       |  FROM inter
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, containment_a, containment_b FROM c
       |WHERE greatest(containment_a, containment_b) >= 0.9
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------ pagerank
  /** PageRank (damping 0.85, 3 iterations) over the undirected near-dup
    * graph from the MinHash-LSH candidate pairs — the centrality view of
    * the duplicate structure: high-rank documents sit at the core of big
    * near-dup families (template hubs, syndicated boilerplate), which is
    * the order a curation pass reviews them in.
    *
    * Bounded-iteration distributed graph compute: each iteration is one
    * edge-keyed join + one destination-keyed aggregate — the exact shape
    * that scales to 10⁹ edges (partition edges by src, re-join the
    * rank vector per round; AQE handles hub skew). The pair frame is
    * `localCheckpoint`'d so three unrolled iterations read the LSH join
    * once, not three times; node count enters as a broadcast one-row
    * frame, never a driver scalar.
    */
  // Explicit independent literals, NOT teleport = (1.0 - damping): the
  // subtraction evaluates to 0.15000000000000002 while a literal 0.15 is a
  // different double — the cross-engine divergence class the MMR lam/pen
  // fix closed. One definition for both the Column tree and the SQL mirror.
  private val PageRankDamping = 0.85
  private val PageRankTeleport = 0.15

  def pagerankSimGraph(s: SparkSession, d: String): DataFrame = {
    val damping = PageRankDamping
    val teleport = PageRankTeleport
    val pairs = lshPairs(s, d).select("doc_a", "doc_b").localCheckpoint()
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = edges.groupBy(col("src").as("doc_id"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
      .localCheckpoint()
    val nn = broadcast(deg.agg(count(lit(1)).cast("double").as("nn")))
    var ranks = deg.crossJoin(nn)
      .select(col("doc_id"), (lit(1.0) / col("nn")).as("rank"),
        col("outdeg"))
    for (_ <- 1 to 3) {
      val inflow = edges
        .join(ranks.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(sum(col("rank") / col("outdeg")).as("inflow"))
      ranks = deg.crossJoin(nn)
        .join(inflow, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(teleport) / col("nn") +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"),
          col("outdeg"))
    }
    ranks.select(col("doc_id"), col("outdeg").cast("long").as("out_deg"),
        round(col("rank"), 6).as("pagerank"))
      .orderBy("doc_id")
  }

  val pagerankSimGraphSql: String =
    s"""WITH $lshPairsSqlCtes,
       |ed AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM lshpairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM lshpairs),
       |deg AS (SELECT src AS doc_id, count(*)::DOUBLE AS outdeg
       |        FROM ed GROUP BY 1),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
       |r0 AS (SELECT doc_id, outdeg, 1.0 / (SELECT n FROM nn) AS rank
       |       FROM deg),
       |c1 AS (SELECT e.dst AS doc_id, sum(p.rank / p.outdeg) AS inflow
       |       FROM ed e JOIN r0 p ON e.src = p.doc_id GROUP BY 1),
       |r1 AS (SELECT g.doc_id, g.outdeg,
       |         $PageRankTeleport / (SELECT n FROM nn)
       |           + $PageRankDamping * coalesce(c.inflow, 0) AS rank
       |       FROM deg g LEFT JOIN c1 c USING (doc_id)),
       |c2 AS (SELECT e.dst AS doc_id, sum(p.rank / p.outdeg) AS inflow
       |       FROM ed e JOIN r1 p ON e.src = p.doc_id GROUP BY 1),
       |r2 AS (SELECT g.doc_id, g.outdeg,
       |         $PageRankTeleport / (SELECT n FROM nn)
       |           + $PageRankDamping * coalesce(c.inflow, 0) AS rank
       |       FROM deg g LEFT JOIN c2 c USING (doc_id)),
       |c3 AS (SELECT e.dst AS doc_id, sum(p.rank / p.outdeg) AS inflow
       |       FROM ed e JOIN r2 p ON e.src = p.doc_id GROUP BY 1),
       |r3 AS (SELECT g.doc_id, g.outdeg,
       |         $PageRankTeleport / (SELECT n FROM nn)
       |           + $PageRankDamping * coalesce(c.inflow, 0) AS rank
       |       FROM deg g LEFT JOIN c3 c USING (doc_id))
       |SELECT doc_id, CAST(outdeg AS BIGINT) AS out_deg,
       |  round(rank, 6) AS pagerank
       |FROM r3 ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank_sim_graph" -> (pagerankSimGraph _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_winnow" -> (dedupWinnow _),
    "winnow_grow_screen" -> (winnowGrowScreen _),
    "decontaminate_substring" -> (decontaminateSubstring _),
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_clusters" -> (dedupClusters _),
    "split_leakage_safe" -> (splitLeakageSafe _),
    "dedup_soft_weights" -> (dedupSoftWeights _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_ensemble" -> (dedupEnsemble _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_spans" -> (dedupSpans _),
    "dedup_span_bloom" -> (dedupSpanBloom _),
    "split_gram_overlap" -> (splitGramOverlap _),
    "span_provenance" -> (spanProvenance _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_incremental_indexed" -> (dedupIncrementalIndexed _),
    "decontaminate_ngram" -> (decontaminateNgram _),
    "source_overlap_matrix" -> (sourceOverlapMatrix _),
    "contamination_by_source" -> (contaminationBySource _),
    "dedup_keep_best" -> (dedupKeepBest _),
    "decontaminate_embedding" -> (decontaminateEmbedding _))

  def oracles: Map[String, String] = Map(
    "pagerank_sim_graph" -> pagerankSimGraphSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_winnow" -> dedupWinnowSql,
    "winnow_grow_screen" -> winnowGrowScreenSql,
    "decontaminate_substring" -> decontaminateSubstringSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_clusters" -> dedupClustersSql,
    "split_leakage_safe" -> splitLeakageSafeSql,
    "dedup_soft_weights" -> dedupSoftWeightsSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_ensemble" -> dedupEnsembleSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "dedup_spans" -> dedupSpansSql,
    "dedup_span_bloom" -> dedupSpanBloomSql,
    "split_gram_overlap" -> splitGramOverlapSql,
    "span_provenance" -> spanProvenanceSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_incremental_indexed" -> dedupIncrementalSql,
    "decontaminate_ngram" -> decontaminateNgramSql,
    "source_overlap_matrix" -> sourceOverlapMatrixSql,
    "contamination_by_source" -> contaminationBySourceSql,
    "dedup_keep_best" -> dedupKeepBestSql,
    "decontaminate_embedding" -> decontaminateEmbeddingSql)
}
