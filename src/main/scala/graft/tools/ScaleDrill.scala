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
  private def upsample(spark: SparkSession, base: String, copies: Int,
      out: String): Unit = {
    Tables.documents(spark, base)
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("k"))
      .select(
        (col("doc_id") + col("k") * 10000000L).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1w"), col("k")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Tables.embeddings(spark, base)
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("k"))
      .select(
        (col("vec_id") + col("k") * 10000000L).as("vec_id"),
        expr("transform(sequence(0, size(embedding) - 1), " +
          "i -> element_at(embedding, CAST((i + k) % size(embedding) AS INT) + 1))")
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    Tables.events(spark, base)
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("k"))
      .select(
        (col("event_id") + col("k") * 100000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("k") * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime(); val n = f
    ((System.nanoTime() - t0) / 1e9, n)
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
    val big = graft.operators.Scratch.tempParent(s"graft-sfx$copies").toString
    println(s"[drill] generating x$copies fixture at $big ...")
    val (genT, _) = time { upsample(spark, base, copies, big); 0L }
    println(f"[drill] generated in $genT%.1f s")

    import graft.operators.{Dedup, Similarity, TextAnalysis}
    import graft.operators.TemporalJoins
    val defaults = Seq("text_fingerprint", "dedup_ngram_jaccard",
      "dedup_containment", "dedup_clusters", "semdedup_prune",
      "asof_join_native", "dedup_winnow", "dedup_minhash_lsh",
      "quality_classifier", "lm_perplexity")
    val all = TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ TemporalJoins.queries ++
      graft.operators.Scoring.queries
    val chosen = if (args.length > 2) args(2).split(",").toSeq else defaults
    val families: Seq[(String, (SparkSession, String) => DataFrame)] =
      chosen.map(n => n -> all(n))

    println(f"[drill] ${"family"}%-22s ${"t_base"}%9s ${"t_x" + copies}%9s ${"ratio"}%7s ${"exponent"}%8s rows")
    val rows = families.map { case (name, fn) =>
      fn(spark, base).count() // warm-up: codegen + JIT at base scale
      val tb = Seq.fill(2)(time(fn(spark, base).count())).minBy(_._1)
      fn(spark, big).count() // warm-up at big scale (pays any cached builds)
      val tx = Seq.fill(2)(time(fn(spark, big).count())).minBy(_._1)
      val ratio = tx._1 / tb._1
      val expo = math.log(ratio) / math.log(copies.toDouble)
      println(f"[drill] $name%-22s ${tb._1}%8.2fs ${tx._1}%8.2fs $ratio%7.2f $expo%8.2f ${tb._2}->${tx._2}")
      (name, tb._1, tx._1, ratio, expo)
    }
    val worst = rows.maxBy(_._5)
    println(f"[drill] worst exponent: ${worst._1} ${worst._5}%.2f")
    spark.stop() // Scratch's shutdown hook removes the generated fixture
  }
}
