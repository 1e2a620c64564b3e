package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale-slope drill at sf1 (VERDICT r10 item 3): measures the wall-time
  * growth of the most expensive operator families between sf0.1 and a
  * locally generated ×10 corpus (≈ sf1 — 500k documents, 100k embeddings,
  * 1M events), turning the "the plan shape survives 100×" claims into
  * measured exponents.
  *
  * Fixture: the CONTROLLED construction of `ScalingSlopeSpec`, at ×10 —
  * each copy k rewrites every token with a copy-distinct suffix
  * (disjoint vocabulary per copy ⇒ the true near-dup structure per copy
  * is exactly the base corpus's, so total true-pair mass grows ×10
  * linearly and measured slopes isolate the ALGORITHM, not the corpus's
  * own duplicate growth); embeddings are circularly shifted per copy
  * (within-copy cosine geometry preserved exactly, cross-copy
  * decorrelated); events replicate with per-copy user/event id offsets
  * (per-user series length constant — the as-of merge's sort runs are
  * 10× as many, not 10× as long).
  *
  * Measurement: per family, one warm-up run then min-of-2 at each scale,
  * exponent = log(t_big/t_base) / log(r). Scan-bound and banded families
  * target exponent ≈ 1 (the generous ceiling asserted here is 1.35 to
  * absorb constant-factor noise at the small end); anything ≈ 2 is a
  * plan that bends quadratic and must be fixed, not documented.
  *
  * A tool main, not a ScalaTest: the drill costs minutes and belongs in
  * PLANS.md evidence, not in every `sbt test` loop.
  */
object ScaleDrill {
  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime(); val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** Committed per-family scale floors (`slope_floors.json`) — the
    * scale-dimension twin of `bench_floors.json` (VERDICT r11 item 3):
    * bench floors gate per-query TIME at sf0.1; nothing gated behavior
    * AT SCALE, so a plan rewrite that kept the sf0.1 constant but bent a
    * family quadratic would pass every gate until someone re-read the
    * drill table.
    *
    * What the gate compares is the ×N-END TIME (`t_big`, min-ratcheted
    * like bench floors — lower is unambiguously better) plus an absolute
    * exponent ceiling, NOT an exponent floor: a raw-exponent ratchet is
    * ill-posed because a constant-factor improvement at the BASE scale
    * raises the measured exponent while making every absolute number
    * better (the conditional-repartition fingerprint fix measured
    * exponent 0.40 over the old plan's −0.04 precisely because its base
    * got 2× faster at an equal t_big — a "regression" no user ever
    * experiences). A genuine quadratic bend cannot hide from this pair:
    * it either blows past [[SlopeBigFactor]] × the committed t_big or
    * crosses [[SlopeCeiling]]. Measured exponents are still recorded in
    * the file and artifact for the round record. Floors are keyed by
    * the copies factor: an ×10 t_big must never gate an ×3 run.
    * `SPARK_GRAFT_UPDATE_SLOPES=1` rewrites each family with the run of
    * min(t_big) — ratchet down, never up. */
  /** Calibrated against MEASURED same-binary variance, not wishfulness:
    * a round-12 investigation re-ran `dedup_ngram_jaccard` on one fixed
    * ×10 corpus with unchanged code and got t_big ∈ {5.6, 9.3, 18.4,
    * 20.8, 28.1, 43.8} across runs — DuckDB confirmed the candidate
    * pair mass exactly linear (1.27M → 12.7M), GC logs showed zero full
    * collections, and a 60 s 32-way burn showed no host throttling; the
    * swings are runtime-adaptive (AQE join-strategy flips + allocation
    * pressure) and bimodal around ~3×. A 2× factor therefore flags
    * healthy plans on unlucky runs; 4× stays far below the ~10× a
    * genuine quadratic bend shows at ×10 while absorbing the measured
    * noise band. Sampling is min-of-3 per scale for the same reason. */
  private val SlopeBigFactor = 4.0
  private val SlopeCeiling = 1.35
  private def slopesPath: String =
    sys.env.getOrElse("SPARK_GRAFT_SLOPES", "slope_floors.json")

  private def readSlopes(copies: Int): Map[String, (Double, Double)] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(new java.io.File(slopesPath))
      if (root.path("copies").asInt(-1) != copies) Map.empty
      else {
        val it = root.path("families").properties().iterator()
        val b = Map.newBuilder[String, (Double, Double)]
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> ((e.getValue.path("t_big").asDouble(),
            e.getValue.path("exponent").asDouble()))
        }
        b.result()
      }
    } catch { case _: Throwable => Map.empty }

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def writeSlopes(copies: Int,
      merged: Map[String, (Double, Double)]): Unit = {
    val body = merged.toSeq.sortBy(_._1)
      .map { case (k, (tb, e)) =>
        s"""    "$k": {"t_big": ${num(tb)}, "exponent": ${num(e)}}""" }
      .mkString(",\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(slopesPath),
      s"""{\n  "copies": $copies,\n  "families": {\n$body\n  }\n}\n""")
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_DRILL_FIXTURE reuses a pre-generated ×copies corpus
    // (persisted by a prior `SfGen <base> <copies> <dir>` run) so iterative
    // single-family drills and the round-closing oracle sweep share one
    // generation instead of paying it per invocation. The caller owns the
    // fixture's lifetime (no shutdown-hook delete on the reused path).
    val big = sys.env.get("SPARK_GRAFT_DRILL_FIXTURE") match {
      case Some(dir) if new java.io.File(dir).isDirectory =>
        println(s"[drill] reusing fixture at $dir (caller asserts x$copies of $base)")
        dir
      case _ =>
        val dir = graft.operators.Scratch.tempParent(s"graft-sfx$copies").toString
        println(s"[drill] generating x$copies fixture at $dir ...")
        // full-table generation (SfGen) so part-keyed families can drill
        // too; documents/embeddings/events use the identical construction
        // the original drill-local upsample had
        val (genT, _) = time { SfGen.upsampleAll(spark, base, copies, dir); 0L }
        println(f"[drill] generated in $genT%.1f s")
        dir
    }

    import graft.operators.{Dedup, Similarity, TextAnalysis}
    import graft.operators.TemporalJoins
    val defaults = Seq("text_fingerprint", "dedup_ngram_jaccard",
      "dedup_containment", "dedup_clusters", "semdedup_prune",
      "asof_join_native", "dedup_winnow", "dedup_minhash_lsh",
      "quality_classifier", "lm_perplexity", "text_edit_distance",
      "edit_screen", "ann_grow_serve", "ann_index_drift",
      "ann_retrain_report")
    val all = TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ TemporalJoins.queries ++
      graft.operators.Scoring.queries ++
      graft.operators.DataQuality.queries ++
      graft.operators.Relational.queries
    val chosen = if (args.length > 2) args(2).split(",").toSeq else defaults
    val families: Seq[(String, (SparkSession, String) => DataFrame)] =
      chosen.map(n => n -> all(n))

    println(f"[drill] ${"family"}%-22s ${"t_base"}%9s ${"t_x" + copies}%9s ${"ratio"}%7s ${"exponent"}%8s rows")
    val rows = families.map { case (name, fn) =>
      // between-family hygiene: a long-lived drill JVM accumulates pinned
      // localCheckpoint blocks and cached relations from every previous
      // family, and the round-12 adjudication measured 2-5× inflation on
      // later families from exactly this (steady-state re-profiles in a
      // fresh JVM sat at 1.0-2.7× their floors while the in-drill samples
      // flagged at 5×). Cross-family state that must survive lives on
      // disk (indexes) or in driver maps (codebooks), never in Spark
      // blocks, so dropping them between families is safe by design.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      fn(spark, base).count() // warm-up: codegen + JIT at base scale
      val tb = Seq.fill(3)(time(fn(spark, base).count())).minBy(_._1)
      fn(spark, big).count() // warm-up at big scale (pays any cached builds)
      val tx = Seq.fill(3)(time(fn(spark, big).count())).minBy(_._1)
      val ratio = tx._1 / tb._1
      val expo = math.log(ratio) / math.log(copies.toDouble)
      println(f"[drill] $name%-22s ${tb._1}%8.2fs ${tx._1}%8.2fs $ratio%7.2f $expo%8.2f ${tb._2}->${tx._2}")
      (name, tb._1, tx._1, ratio, expo)
    }
    val worst = rows.maxBy(_._5)
    println(f"[drill] worst exponent: ${worst._1} ${worst._5}%.2f")
    // ---- scale regression gate vs committed x-N-end time floors ----
    val floors = readSlopes(copies)
    val regressions = rows.sortBy(_._1).flatMap { case (name, _, tBig, _, expo) =>
      val bigHit = floors.get(name)
        .filter { case (fb, _) => fb > 0 && tBig > SlopeBigFactor * fb }
        .map { case (fb, _) =>
          s"""{"family":"$name","t_big":${num(tBig)},"floor_t_big":${num(fb)},"exponent":${num(expo)}}""" }
      val ceilHit =
        if (expo > SlopeCeiling)
          Some(s"""{"family":"$name","exponent":${num(expo)},"ceiling":$SlopeCeiling}""")
        else None
      bigHit.orElse(ceilHit)
    }
    if (sys.env.get("SPARK_GRAFT_UPDATE_SLOPES").contains("1") && args.length <= 2) {
      // never merge a subset run's numbers over the committed defaults,
      // and never mix copies factors (readSlopes already refused those)
      val merged = (floors.keySet ++ rows.map(_._1)).flatMap { k =>
        val cand = rows.find(_._1 == k).map(r => (r._3, r._5))
        (floors.get(k).toSeq ++ cand.toSeq) match {
          case Nil => None
          case cs => Some(k -> cs.minBy(_._1)) // run with the best t_big wins
        }
      }.toMap
      writeSlopes(copies, merged)
      System.err.println(s"[drill] slope floors updated at $slopesPath (${merged.size} families)")
    }
    val expJson = rows.sortBy(_._1)
      .map { case (n, _, _, _, e) => s""""$n":${num(e)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_drill","copies":$copies,"exponents":$expJson,"worst":"${worst._1}","worst_exponent":${num(worst._5)},"slope_regressions":[${regressions.mkString(",")}]}""")
    spark.stop() // Scratch's shutdown hook removes the generated fixture
  }
}
