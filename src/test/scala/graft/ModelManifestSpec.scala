package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.models.ModelManifest
import graft.operators.{Dedup, Scoring, Similarity, TextAnalysis}

/** The ONE persisted-model contract (VERDICT r10 item 5): every `write*`
  * training path leaves a `manifest.json` and every serving path refuses
  * a dir whose manifest is missing, of the wrong kind, of a future
  * schema, or — for corpus-positional artifacts (cluster labels, the
  * incremental-dedup history index) — trained on a corpus whose
  * fingerprint no longer matches. One table-driven pass over ALL
  * write/serve pairs, so a model family added without wiring the
  * manifest shows up as a missing row here, not as a silent ad-hoc
  * layout.
  */
class ModelManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def docProbes: DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text").limit(20)
  private def srcProbes: DataFrame =
    Tables.documents(spark, sf).select("source", "text").limit(20)
  private def vecProbes: DataFrame =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").limit(10)

  /** (kind, writer, server) — the server must force the gate (validate
    * runs eagerly at call time, before any Spark action). */
  private lazy val pairs: Seq[(String, String => Unit, String => Any)] = Seq(
    ("ann_ivf_index",
      dir => Similarity.writeAnnIndex(spark, sf, dir),
      dir => Similarity.annFromIndex(spark, vecProbes, dir)),
    ("semdedup_index",
      dir => Similarity.writeSemdedupIndex(spark, sf, dir),
      dir => Similarity.semdedupScreenFromModel(spark, dir, vecProbes)),
    ("dedup_incremental_index",
      dir => Dedup.writeDedupIndex(spark, sf, dir),
      dir => Dedup.dedupIncrementalFromIndex(spark, sf, dir)),
    ("cluster_labels",
      dir => Dedup.writeClusterLabels(spark, sf, dir),
      dir => Dedup.splitLeakageSafeFromLabels(spark, sf, dir)),
    ("winnow_index",
      dir => Dedup.writeWinnowIndex(spark, sf, dir),
      dir => Dedup.winnowIndexFps(spark, dir)),
    ("edit_index",
      dir => TextAnalysis.writeEditIndex(spark, sf, dir),
      dir => TextAnalysis.editIndexSegments(spark, dir)),
    ("bpe_merges",
      dir => TextAnalysis.writeBpeMerges(spark, sf, dir),
      dir => TextAnalysis.bpeMergesFromModel(spark, dir)),
    ("tokenizer_vocab",
      dir => TextAnalysis.writeVocabModel(spark, sf, dir),
      dir => TextAnalysis.vocabCoverageFromModel(spark, dir, srcProbes)),
    ("ngram_novelty",
      dir => TextAnalysis.writeNoveltyModel(spark, sf, dir),
      dir => TextAnalysis.noveltyScoreFromModel(spark, dir, docProbes)),
    ("token_kl",
      dir => TextAnalysis.writeTokenKlModel(spark, sf, dir),
      dir => ModelManifest.validate(spark, dir, "token_kl")),
    ("lm_bigram",
      dir => Scoring.writeLmModel(spark, sf, dir),
      dir => Scoring.lmScoreFromModel(spark, dir, docProbes)),
    ("bm25",
      dir => Scoring.writeBm25Model(spark, sf, dir),
      dir => Scoring.bm25ScoreFromModel(spark, dir, docProbes)),
    ("dsir",
      dir => Scoring.writeDsirModel(spark, sf, dir),
      dir => Scoring.dsirScoreFromModel(spark, dir, docProbes)),
    ("quality_classifier",
      dir => Scoring.writeQualityClassifier(spark, sf, dir),
      dir => Scoring.qcScoreFromModel(spark, dir, docProbes)))

  private def expectRefusal(frag: String)(f: => Any): String = {
    val e = intercept[IllegalStateException](f)
    assert(e.getMessage.contains(frag),
      s"error must name '$frag': ${e.getMessage}")
    e.getMessage
  }

  test("every write/serve pair: manifest round-trips, wrong kind and missing manifest refuse loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    try {
      val dirs = pairs.map { case (kind, write, _) =>
        val dir = s"$base/$kind"
        write(dir)
        val m = ModelManifest.validate(spark, dir, kind)
        assert(m.schemaVersion == ModelManifest.SchemaVersion)
        assert(m.sourceDir == sf && m.corpusFingerprint.nonEmpty)
        kind -> dir
      }.toMap
      // serve happy path: the gate passes and the server is constructible
      pairs.foreach { case (kind, _, serve) => serve(dirs(kind)) }
      // wrong kind: point every server at the NEXT pair's artifact
      pairs.zipWithIndex.foreach { case ((kind, _, serve), i) =>
        val other = pairs((i + 1) % pairs.size)._1
        expectRefusal(s"expects '$kind'")(serve(dirs(other)))
      }
      // missing manifest: a bare dir with plausible subdirs is refused
      val bare = s"$base/bare"
      Tables.documents(spark, sf).limit(1).write.parquet(s"$bare/labels")
      pairs.foreach { case (_, _, serve) =>
        expectRefusal("no manifest.json")(serve(bare))
      }
    } finally SparkTestSession.deleteRecursively(base)
  }

  test("future manifest schema is refused, not half-read") {
    val base = java.nio.file.Files.createTempDirectory("graft-manifest-v").toString
    try {
      val dir = s"$base/m"
      Scoring.writeBm25Model(spark, sf, dir)
      // tamper through the Hadoop FS (plain NIO would break the local
      // ChecksumFileSystem's .crc sidecar and fail for the wrong reason)
      val hp = new org.apache.hadoop.fs.Path(s"$dir/${ModelManifest.FileName}")
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val body = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"$dir/${ModelManifest.FileName}"))
        .replace(s""""schema_version": ${ModelManifest.SchemaVersion}""",
          s""""schema_version": ${ModelManifest.SchemaVersion + 1}""")
      val out = fs.create(hp, true)
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      expectRefusal("schema")(Scoring.bm25ScoreFromModel(spark, dir, docProbes))
    } finally SparkTestSession.deleteRecursively(base)
  }

  test("interrupted retrain is refused: invalidate drops the old manifest before data rewrites") {
    val base = java.nio.file.Files.createTempDirectory("graft-manifest-retrain").toString
    try {
      val dir = s"$base/m"
      Scoring.writeBm25Model(spark, sf, dir)
      ModelManifest.validate(spark, dir, "bm25")
      // simulate a retrain that crashed after invalidate (every write*
      // path's first statement) but before the final manifest write: the
      // dir still holds full model parquet from the previous train, yet
      // must read as a partial training run
      ModelManifest.invalidate(spark, dir)
      expectRefusal("no manifest.json")(Scoring.bm25ScoreFromModel(spark, dir, docProbes))
      // a completed retrain re-arms serving
      Scoring.writeBm25Model(spark, sf, dir)
      Scoring.bm25ScoreFromModel(spark, dir, docProbes)
      // invalidate on a dir with no manifest is a no-op, not an error
      ModelManifest.invalidate(spark, s"$base/never-written")
    } finally SparkTestSession.deleteRecursively(base)
  }

  test("corpus-positional artifacts refuse a drifted corpus as STALE") {
    val base = java.nio.file.Files.createTempDirectory("graft-manifest-stale").toString
    try {
      // a private corpus copy we are allowed to mutate
      val corpus = s"$base/corpus"
      Tables.documents(spark, sf).write.parquet(s"$corpus/documents.parquet")
      val labels = s"$base/labels"; val index = s"$base/index"
      Dedup.writeClusterLabels(spark, corpus, labels)
      Dedup.writeDedupIndex(spark, corpus, index)
      // trains and serves against the same bytes: fine
      Dedup.dedupKeepBestFromLabels(spark, corpus, labels)
      Dedup.dedupSoftWeightsFromLabels(spark, corpus, labels)
      Dedup.splitLeakageSafeFromLabels(spark, corpus, labels)
      Dedup.dedupIncrementalFromIndex(spark, corpus, index)
      // the corpus grows: every positional server must refuse
      Tables.documents(spark, sf)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .write.mode("append").parquet(s"$corpus/documents.parquet")
      expectRefusal("STALE")(Dedup.dedupKeepBestFromLabels(spark, corpus, labels))
      expectRefusal("STALE")(Dedup.dedupSoftWeightsFromLabels(spark, corpus, labels))
      expectRefusal("STALE")(Dedup.splitLeakageSafeFromLabels(spark, corpus, labels))
      expectRefusal("STALE")(Dedup.dedupIncrementalFromIndex(spark, corpus, index))
      // retraining on the grown corpus re-arms serving
      Dedup.writeClusterLabels(spark, corpus, labels)
      Dedup.dedupKeepBestFromLabels(spark, corpus, labels)
    } finally SparkTestSession.deleteRecursively(base)
  }
}
