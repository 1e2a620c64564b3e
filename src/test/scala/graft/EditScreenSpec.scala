package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** The edit-distance family's serving split (VERDICT r11 item 5):
  * persisted PassJoin segment index + batch/streaming screen. A synthetic
  * three-name corpus makes every verdict deterministic: distance-1 and
  * distance-2 perturbations must be flagged with the exact distance,
  * an exact copy surfaces at distance 0, and anything ≥ 3 edits away —
  * including wholly novel names — must score zero (K = 2 is the family
  * contract shared with `text_edit_distance`).
  */
class EditScreenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val corpus = Seq(
    (1L, "alphabravo"), (2L, "charliedelta"), (3L, "echofoxtrot"))

  private def writeCorpus(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-edit-corpus").toString
    corpus.toDF("p_partkey", "p_name").write.parquet(s"$dir/part.parquet")
    dir
  }

  test("edit screen: planted near-dups flagged at their exact distance, distance-3 and novel clean") {
    import spark.implicits._
    val corpusDir = writeCorpus()
    val indexDir = java.nio.file.Files.createTempDirectory("graft-edit-idx").toString
    try {
      operators.TextAnalysis.writeEditIndex(spark, corpusDir, indexDir)
      val segs = operators.TextAnalysis.editIndexSegments(spark, indexDir)
      // (K+1) = 3 segment rows per distinct corpus name
      assert(segs.count() == corpus.size * 3L)
      val probes = Seq(
        (10L, "alphabrav"),    // deletion of the last char     -> dist 1
        (11L, "alphabraXY"),   // two substitutions             -> dist 2
        (12L, "zzzzyyyyxx"),   // novel                         -> no match
        (2L, "charliedelta"),  // exact copy of history         -> dist 0
        (13L, "echofoxAAAt"))  // three substitutions           -> no match (> K)
      val got = operators.TextAnalysis.editScreenBatch(
        probes.toDF("key", "name"), segs).collect()
        .map(r => r.getAs[Long]("key") ->
          ((r.getAs[Long]("n_matches"), r.getAs[Int]("best_dist"),
            r.getAs[Boolean]("suspect")))).toMap
      assert(got.size == 5, "screen must be total: every probe surfaces")
      assert(got(10L) == ((1L, 1, true)), s"dist-1 probe: ${got(10L)}")
      assert(got(11L) == ((1L, 2, true)), s"dist-2 probe: ${got(11L)}")
      assert(got(12L) == ((0L, -1, false)), s"novel probe: ${got(12L)}")
      assert(got(2L) == ((1L, 0, true)), s"exact probe: ${got(2L)}")
      assert(got(13L) == ((0L, -1, false)), s"dist-3 probe: ${got(13L)}")

      // streaming replay parity: same probes over 2 micro-batches
      implicit val ctx = spark.sqlContext
      val outDir = java.nio.file.Files.createTempDirectory("graft-edit-out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-edit-ck").toString
      val in = MemoryStream[(Long, String)]
      val (q, cached) = Streams.streamEditScreen(
        in.toDF().toDF("key", "name"), spark, indexDir, outDir, ckpt)
      try {
        in.addData(probes.take(2)); q.processAllAvailable()
        in.addData(probes.drop(2)); q.processAllAvailable()
        val streamed = spark.read.parquet(outDir).collect()
          .map(r => r.getAs[Long]("key") ->
            ((r.getAs[Long]("n_matches"), r.getAs[Int]("best_dist"),
              r.getAs[Boolean]("suspect")))).toMap
        assert(streamed == got, "stream/batch verdicts must replay identically")
      } finally {
        q.stop(); cached.unpersist()
        Seq(outDir, ckpt).foreach(SparkTestSession.deleteRecursively)
      }
      // serving refuses a wrong-kind artifact (the ModelManifestSpec
      // table covers the full matrix; this pins the new kind's name)
      val e = intercept[IllegalStateException](
        operators.TextAnalysis.editIndexSegments(spark, s"$indexDir/segments"))
      assert(e.getMessage.contains("manifest"))
    } finally {
      Seq(corpusDir, indexDir).foreach(SparkTestSession.deleteRecursively)
    }
  }

  test("edit screen grow: a near-dup of a name first seen in a PRIOR batch is caught") {
    import spark.implicits._
    val corpusDir = writeCorpus()
    val indexDir = java.nio.file.Files.createTempDirectory("graft-editg-idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-editg-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-editg-ck").toString
    try {
      operators.TextAnalysis.writeEditIndex(spark, corpusDir, indexDir)
      implicit val ctx = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val (q, cached) = Streams.streamEditScreenGrow(
        in.toDF().toDF("key", "name"), spark, indexDir, outDir, ckpt)
      try {
        // batch 0: a wholly novel name (not near base corpus) — clean,
        // but its segments join the index
        in.addData(Seq((20L, "zebraquux")))
        q.processAllAvailable()
        // batch 1: dist-1 of the batch-0 name (caught ONLY via growth),
        // dist-1 of base history (caught via the frozen index), novel
        in.addData(Seq((21L, "zebraquu"), (22L, "alphabrav"), (23L, "kkkkkwwww")))
        q.processAllAvailable()
        val got = spark.read.parquet(outDir).collect()
          .map(r => r.getAs[Long]("key") ->
            ((r.getAs[Long]("n_matches"), r.getAs[Int]("best_dist"),
              r.getAs[Boolean]("suspect")))).toMap
        assert(got(20L) == ((0L, -1, false)), s"batch-0 novel: ${got(20L)}")
        assert(got(21L) == ((1L, 1, true)),
          s"cross-batch near-dup must be caught via index growth: ${got(21L)}")
        assert(got(22L) == ((1L, 1, true)), s"base-history near-dup: ${got(22L)}")
        assert(got(23L) == ((0L, -1, false)), s"batch-1 novel: ${got(23L)}")
        // the appended index holds both batches' segments, (K+1) per name
        val appended = spark.read.parquet(s"$indexDir/appended")
        assert(appended.count() == 4 * 3L,
          "appended segments must cover every arrived distinct name")
        // redelivery-shaped rerun of batch 1's SCREEN: reading the
        // appended root through the own-batch exclusion must reproduce
        // batch 1's verdicts exactly (its own write is partition-pruned)
        val base = operators.TextAnalysis.editIndexSegments(spark, indexDir)
        val prior = spark.read.parquet(s"$indexDir/appended")
          .filter(org.apache.spark.sql.functions.col("batch_id") =!= 1L)
          .select("name_b", "blk_len", "blk_i", "seg")
        val again = operators.TextAnalysis.editScreenBatch(
          Seq((21L, "zebraquu"), (22L, "alphabrav"), (23L, "kkkkkwwww"))
            .toDF("key", "name"),
          base.select("name_b", "blk_len", "blk_i", "seg").unionByName(prior))
          .collect().map(r => r.getAs[Long]("key") ->
            ((r.getAs[Long]("n_matches"), r.getAs[Int]("best_dist"),
              r.getAs[Boolean]("suspect")))).toMap
        assert(again == got.filter(_._1 >= 21L),
          "redelivered screen must replay batch-1 verdicts identically")
        // compaction folds the growth into the base: the appended tree is
        // gone, the manifest is re-armed (compactions counter bumped),
        // and a cross-batch near-dup is still caught from the ONE relation
        operators.TextAnalysis.compactEditIndex(spark, indexDir)
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$indexDir/appended")))
        val m2 = graft.models.ModelManifest.validate(spark, indexDir, "edit_index")
        assert(m2.params.get("compactions").contains("1"))
        val compacted = operators.TextAnalysis.editIndexSegments(spark, indexDir)
        assert(compacted.count() == (corpus.size + 4) * 3L,
          "compacted base = original + every arrived distinct name, 3 segments each")
        val after = operators.TextAnalysis.editScreenBatch(
          Seq((30L, "zebraquu")).toDF("key", "name"), compacted).collect()
        assert(after.head.getAs[Int]("best_dist") == 0 &&
          after.head.getAs[Long]("n_matches") == 2L,
          // batch-1's zebraquu is now HISTORY (dist 0) and zebraquux is its
          // dist-1 neighbor — both served from the single compacted relation
          s"post-compaction screen: ${after.head}")
        // compaction is idempotent when nothing new was appended
        operators.TextAnalysis.compactEditIndex(spark, indexDir)
        assert(graft.models.ModelManifest.validate(spark, indexDir, "edit_index")
          .params.get("compactions").contains("1"))
      } finally { q.stop(); cached.unpersist() }
    } finally {
      Seq(corpusDir, indexDir, outDir, ckpt)
        .foreach(SparkTestSession.deleteRecursively)
    }
  }

  test("edit screen batch parity with the whole-corpus pair query on fixture names") {
    // screening the fixture's own distinct names against their own index
    // must reproduce text_edit_distance's name-level matches: every name
    // self-matches at 0, and names with a <=K neighbor report it
    val sf = SparkTestSession.sf
    import org.apache.spark.sql.functions._
    val names = Tables.part(spark, sf).select(col("p_name").as("name")).distinct()
    val segs = operators.TextAnalysis.editSegmentsBuild(names)
    val screened = operators.TextAnalysis.editScreenBatch(
      names.select(monotonically_increasing_id().as("key"), col("name")), segs)
    // total + every name finds at least itself at distance 0
    assert(screened.count() == names.count())
    assert(screened.filter(col("best_dist") =!= 0).count() == 0,
      "every self-indexed name must self-match at distance 0")
    // n_matches - 1 (self) must equal the name's degree in the pair query
    val pairDegrees = operators.TextAnalysis.editDistanceCandidates(names)
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("edit_dist") <= 2)
      .select(explode(array(col("name_a"), col("name_b"))).as("name"))
      .groupBy("name").agg(count(lit(1)).as("deg"))
    val mismatches = screened
      .join(pairDegrees, Seq("name"), "left")
      .filter(col("n_matches") - 1 =!= coalesce(col("deg"), lit(0L)))
      .count()
    assert(mismatches == 0, s"$mismatches names disagree with the pair query's degree")
  }
}
