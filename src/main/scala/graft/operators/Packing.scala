package graft.operators

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: assign every document a
  * contiguous global row id and token offset (concat-then-chunk order),
  * then pack the token stream into fixed-budget bins — the step that turns
  * a curated corpus into fixed-length training sequences.
  *
  * The naive formulation is `row_number() OVER (ORDER BY doc_id)` — a
  * single-partition global window that serializes the corpus through one
  * task and cannot run at 100 TB. Here the offsets are computed with the
  * two-phase pattern Spark itself uses for `zipWithIndex`:
  *
  *   1. range-partition by doc_id and sort within partitions (one wide
  *      exchange, each partition holds a contiguous doc_id range);
  *   2. a tiny per-partition aggregate (P rows — partition count, not
  *      corpus size) collected to the driver and prefix-summed into
  *      per-partition row/token offsets;
  *   3. one narrow mapPartitions pass that streams each partition in
  *      order, adding the partition's offset to a running local sum.
  *
  * The only driver-side state is the P-row offset table; every corpus-sized
  * step is distributed. Output is invariant to the range partitioner's
  * sampled boundaries — offsets compose to the same global prefix sum
  * wherever the cuts land.
  */
object Packing {

  /** Tokens per packed training sequence (the bin budget). */
  val PackBudget = 512L

  /** (doc_id, n_tok, row_id, start_tok) with contiguous row ids and global
    * token offsets in doc_id order — shared by both queries.
    */
  private def offsets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val parts = math.max(s.sparkContext.defaultParallelism, 1)
    val sized = Tables.documents(s, d)
      .select(col("doc_id"), size(Portable.tokens(col("text"))).cast("long").as("n_tok"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      // the two passes below (per-partition totals, then the offset-adding
      // scan) must see identical partitions; materialize once instead of
      // re-running the range exchange
      .localCheckpoint()
    // phase 1: per-partition (row count, token count) — P rows on the driver
    val perPart = sized
      .select(spark_partition_id().as("pid"), col("n_tok"))
      .groupBy("pid")
      .agg(count(lit(1)).as("rows"), sum("n_tok").as("toks"))
      .collect()
      .map(r => (r.getAs[Int]("pid"), (r.getAs[Long]("rows"), r.getAs[Long]("toks"))))
      .toMap
    // prefix-sum into start offsets per partition id
    val pids = perPart.keys.toSeq.sorted
    val offs: Map[Int, (Long, Long)] = pids.zip(
      pids.scanLeft((0L, 0L)) { case ((r0, t0), pid) =>
        val (r, t) = perPart(pid); (r0 + r, t0 + t)
      }).toMap
    // phase 2: narrow scan adding the partition offset to a running sum
    sized.as[(Long, Long)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val (rowOff, tokOff) = offs.getOrElse(pid, (0L, 0L))
      var row = rowOff
      var tok = tokOff
      it.map { case (docId, nTok) =>
        val out = (docId, nTok, row, tok)
        row += 1L
        tok += nTok
        out
      }
    }.toDF("doc_id", "n_tok", "row_id", "start_tok")
  }

  /** Contiguous global ids: (doc_id, row_id 0..n-1, global token offset). */
  def assignRowIds(s: SparkSession, d: String): DataFrame =
    offsets(s, d).select("doc_id", "row_id", "start_tok").orderBy("doc_id")

  val assignRowIdsSql: String =
    """SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_id,
      |  CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS start_tok
      |FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Greedy contiguous packing: a document belongs to the bin its global
    * token offset falls in (concat-then-chunk — documents may straddle a
    * boundary; the bin is where the document STARTS). Emits per-bin
    * composition: doc/token counts and the id range.
    */
  def packSequences(s: SparkSession, d: String): DataFrame =
    offsets(s, d)
      .select(col("doc_id"), col("n_tok"),
        expr(s"start_tok div $PackBudget").as("bin_id"))
      .groupBy("bin_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("bin_id")

  /** Packing efficiency report — the trade-off audit of concat-then-chunk
    * packing: per bin, the docs and tokens it holds, its overflow beyond
    * the [[PackBudget]] (tokens that spill into the next chunk), and the
    * count of BOUNDARY-CROSSING documents — the docs a packed training
    * run truncates across sequence boundaries, i.e. the attention
    * contamination the packing strategy trades for zero padding. A
    * curation team reads this next to `pack_sequences` to decide whether
    * the crossing rate justifies a document-aware packer.
    *
    * Shape at scale: the same two-phase offset machinery as
    * [[packSequences]] (no global window), plus one integer projection.
    */
  def packEfficiency(s: SparkSession, d: String): DataFrame =
    offsets(s, d)
      .select(col("doc_id"), col("n_tok"),
        expr(s"start_tok div $PackBudget").as("bin_id"),
        when(col("n_tok") > 0,
          expr(s"(start_tok + n_tok - 1) div $PackBudget") >
            expr(s"start_tok div $PackBudget"))
          .otherwise(lit(false)).as("crossing"))
      .groupBy("bin_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum(when(col("crossing"), 1L).otherwise(0L)).as("n_crossing"),
        greatest(sum("n_tok") - PackBudget, lit(0L)).as("overflow_toks"))
      .orderBy("bin_id")

  val packEfficiencySql: String =
    s"""WITH o AS (
       |  SELECT doc_id, n_tok,
       |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
       |  FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents)),
       |b AS (
       |  SELECT start_tok // $PackBudget AS bin_id, n_tok,
       |    CASE WHEN n_tok > 0 THEN
       |      (start_tok + n_tok - 1) // $PackBudget > start_tok // $PackBudget
       |    ELSE FALSE END AS crossing
       |  FROM o)
       |SELECT CAST(bin_id AS BIGINT) AS bin_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN crossing THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
       |  CAST(greatest(sum(n_tok) - $PackBudget, 0) AS BIGINT) AS overflow_toks
       |FROM b GROUP BY bin_id ORDER BY bin_id""".stripMargin

  val packSequencesSql: String =
    s"""WITH o AS (
       |  SELECT doc_id, n_tok,
       |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
       |  FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents))
       |SELECT CAST(start_tok // $PackBudget AS BIGINT) AS bin_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc,
       |  max(doc_id) AS last_doc
       |FROM o GROUP BY 1 ORDER BY bin_id""".stripMargin

  // ------------------------------------------------------------- z-order
  /** Bits per dimension of the Morton (z-order) code. */
  val ZBits = 10

  /** Z-order (Morton) data-layout audit: interleave the bits of two join/
    * filter keys into one code, bucket the curve, and report each bucket's
    * span in BOTH dimensions. This is the layout step for multi-dimensional
    * scan pruning at 100 TB: writing the table `repartitionByRange(z) +
    * sortWithinPartitions(z)` makes parquet row-group min/max statistics
    * selective on BOTH keys simultaneously (a single-column sort gives
    * pruning on one dimension and none on the other), so point/range
    * predicates on either key skip most row groups. The z-code is pure
    * bit arithmetic — codegen-friendly in Spark, reproduced verbatim by
    * the DuckDB oracle — and the emitted per-bucket (min, max) spans of
    * each dimension ARE the pruning evidence: every bucket covers a narrow
    * slice of both key ranges.
    */
  def zorderLayout(s: SparkSession, d: String): DataFrame =
    zkeyed(s, d)
      .groupBy(expr(s"zval div ${1L << (2 * ZBits - 8)}").as("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min("xk").as("x_min"), max("xk").as("x_max"),
        min("yk").as("y_min"), max("yk").as("y_max"))
      .orderBy("bucket")

  val zorderLayoutSql: String = {
    val z = (0 until ZBits).map(i =>
      s"(((xk >> $i) & 1) << ${2 * i + 1}) + (((yk >> $i) & 1) << ${2 * i})")
      .mkString(" + ")
    s"""WITH k AS (
       |  SELECT l_orderkey % 1024 AS xk, l_partkey * 5 % 1024 AS yk FROM lineitem),
       |z AS (SELECT xk, yk, $z AS zval FROM k)
       |SELECT zval // ${1L << (2 * ZBits - 8)} AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  min(xk) AS x_min, max(xk) AS x_max,
       |  min(yk) AS y_min, max(yk) AS y_max
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** The z-keyed projection [[zorderLayout]] and both written layouts
    * share: materialized (xk, yk, zval) keys + a payload measure, so
    * predicates on the key columns are pushable into the parquet scan of
    * the written files. shiftleft/shiftright function spelling (the
    * operator forms are the DuckDB oracle's); same arithmetic bit for
    * bit. */
  private def zkeyed(s: SparkSession, d: String): DataFrame = {
    val z = (0 until ZBits).map(i =>
      s"shiftleft(shiftright(xk, $i) & 1, ${2 * i + 1}) + " +
        s"shiftleft(shiftright(yk, $i) & 1, ${2 * i})")
      .mkString(" + ")
    Tables.lineitem(s, d)
      .select((col("l_orderkey") % 1024).as("xk"), (col("l_partkey") * 5 % 1024).as("yk"),
        col("l_quantity"))
      .withColumn("zval", expr(z))
  }

  /** How many files (= row groups at fixture size) each layout is split
    * into; per-file parquet min/max stats are the pruning granularity. */
  val ZLayoutFiles = 16

  /** Write the SAME rows twice under `out`: `out/zorder` clustered by the
    * Morton code (`repartitionByRange(zval) + sortWithinPartitions(zval)`
    * — the layout [[zorderLayout]]'s audit argues for), and `out/linear`
    * clustered 1-D by `xk`. Each layout is [[ZLayoutFiles]] range-
    * partitioned files whose parquet row-group min/max statistics are
    * narrow in (xk AND yk) for the z-order layout but only in xk for the
    * linear one — scan pruning against a 2-D predicate is then directly
    * measurable (the OperatorSpec z-order test asserts it via the scan's output-rows
    * metric). At 100 TB this is the sink-side layout step (reference
    * analog: day-partitioned sink, `google_bigquery.tf:17-21`): one wide
    * exchange per rewrite, pruning forever after.
    */
  def writeZorderLayouts(s: SparkSession, d: String, out: String): Unit = {
    // both layout writes consume the same keyed projection; caching it
    // scans lineitem (and evaluates the bit interleave) once, not twice.
    // The two writes are INDEPENDENT jobs over the same cached frame, so
    // they run concurrently (guide §2.6 overlap-independent-jobs): each
    // write's range-sampling and commit tail would otherwise leave most
    // cores idle while the other waits. Job-description properties are
    // thread-local, hence the inheritance into each write thread.
    val keyed = zkeyed(s, d).persist()
    try {
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val writes = Seq(
        Future {
          keyed.repartitionByRange(ZLayoutFiles, col("zval"))
            .sortWithinPartitions("zval")
            .write.mode("overwrite").parquet(s"$out/zorder")
        },
        Future {
          keyed.repartitionByRange(ZLayoutFiles, col("xk"))
            .sortWithinPartitions("xk")
            .write.mode("overwrite").parquet(s"$out/linear")
        })
      // settle BOTH futures before unpersisting (a failed first write
      // must not leave the second racing the cache teardown), then
      // rethrow the first failure
      val settled = writes.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
      pool.shutdown()
      settled.foreach(_.get)
    } finally { keyed.unpersist(); () }
  }

  /** The 2-D pruning predicate the layout exists for: a narrow yk slice ×
    * a moderate xk range (point-in-both-dimensions workloads). Constants
    * are fixture-stable and shared with the oracle. */
  val ZPredicate: String = "xk >= 100 AND xk < 400 AND yk >= 50 AND yk < 80"

  /** End-to-end z-order proof query: write both layouts, read each BACK
    * from parquet through the 2-D predicate, and emit one aggregate row
    * per layout. Correctness: the two rows must agree with each other and
    * with the oracle computing the same aggregate straight off `lineitem`
    * — the layout must never change WHAT is read, only how little. The
    * scan-level pruning inequality (z-order emits strictly fewer rows
    * from the scan than the 1-D layout under this predicate) is asserted
    * in the OperatorSpec z-order test via executed-plan metrics; a hash-compared oracle
    * row can't carry scan metrics.
    */
  /** Parent scratch directory for the pruning proof's layout writes.
    * Every [[zorderPruning]] call gets its OWN UUID subdir beneath it, so
    * concurrent invocations in one JVM cannot race a layout overwrite
    * against another call's read (the returned DataFrame reads the layout
    * parquet lazily). The whole tree is deleted by a JVM shutdown hook
    * ([[Scratch.tempParent]]) — a long-lived JVM accumulates one small
    * subtree per call, bounded by the handful of invocations
    * Verify/Bench/test actually make. */
  private lazy val zorderScratchParent: java.nio.file.Path =
    Scratch.tempParent("graft_zorder")

  def zorderPruning(s: SparkSession, d: String): DataFrame = {
    val out = java.nio.file.Files
      .createTempDirectory(zorderScratchParent, "run").toString
    writeZorderLayouts(s, d, out)
    def agg(layout: String) =
      s.read.parquet(s"$out/$layout").filter(expr(ZPredicate))
        .agg(
          count(lit(1)).as("n_rows"),
          sum("l_quantity").cast("long").as("sum_qty"),
          min("zval").as("z_min"), max("zval").as("z_max"))
        .select(lit(layout).as("layout"), col("n_rows"), col("sum_qty"),
          col("z_min"), col("z_max"))
    agg("linear").unionAll(agg("zorder")).orderBy("layout")
  }

  val zorderPruningSql: String = {
    val z = (0 until ZBits).map(i =>
      s"(((xk >> $i) & 1) << ${2 * i + 1}) + (((yk >> $i) & 1) << ${2 * i})")
      .mkString(" + ")
    s"""WITH k AS (
       |  SELECT l_orderkey % 1024 AS xk, l_partkey * 5 % 1024 AS yk, l_quantity
       |  FROM lineitem),
       |z AS (SELECT xk, yk, l_quantity, $z AS zval FROM k
       |      WHERE ${ZPredicate.toLowerCase}),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |             CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       |             min(zval) AS z_min, max(zval) AS z_max FROM z)
       |SELECT layout, n_rows, sum_qty, z_min, z_max
       |FROM (SELECT 'linear' AS layout UNION ALL SELECT 'zorder'), a
       |ORDER BY layout""".stripMargin
  }

  // ------------------------------------------------- small-file compaction
  /** Compact a directory of small parquet files into ~`targetBytes` output
    * files — the table-maintenance pass every streaming/incremental sink
    * eventually needs (each micro-batch appends a few files; a year of
    * 1-minute batches is half a million files whose open/footer/seek
    * overhead dominates scans long before data size does).
    *
    * The partition count is planned from FILE METADATA (a driver-side
    * listing summing `len`), never from a data scan — at 100 TB the
    * listing is O(files) name-node calls and the data is read exactly
    * once, written exactly once. Round-robin `repartition` (not
    * `coalesce`) is deliberate: coalesce would merge without a shuffle
    * but chains unevenly-sized inputs into unevenly-sized outputs and,
    * worse, caps the scan's parallelism at the output count; the shuffle
    * buys evenly-sized files, which is the point of the pass.
    * `maxRecordsPerFile` is the belt-and-braces bound for the skewed-row
    * case (rows whose serialized size dwarfs the estimate).
    *
    * Returns the planned partition count; the OperatorSpec compaction test asserts output
    * file count, row preservation, and per-file row bounds.
    */
  def compactFiles(s: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, maxRecordsPerFile: Long = 0L): Int = {
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    // recursive: a partitioned layout (batch_id=N/... — exactly the
    // streaming-sink shape this pass exists for) keeps its files in
    // subdirectories; a top-level listing would see 0 bytes and plan one
    // giant output partition
    val files = fs.listFiles(inPath, true)
    var totalBytes = 0L
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) totalBytes += f.getLen
    }
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val writer = s.read.parquet(inDir).repartition(parts).write.mode("overwrite")
    (if (maxRecordsPerFile > 0L)
      writer.option("maxRecordsPerFile", maxRecordsPerFile)
    else writer).parquet(outDir)
    parts
  }

  /** Order-preserving compaction for SORTED layouts — the mode that
    * composes with [[writeZorderLayouts]]. Round-robin [[compactFiles]]
    * deliberately shuffles for even file sizes, which destroys any
    * z-order/sort clustering the input had (each output file then spans
    * the full key range, so parquet min/max pruning dies). This mode
    * instead bin-packs ADJACENT files: a range-partitioned write names
    * files in range order (`part-00000` < `part-00001` ⇒ key order), so a
    * greedy walk over the SAME driver-side file-metadata listing
    * [[compactFiles]] uses groups contiguous runs of files up to
    * `targetBytes`. Each group is read and locally sorted on `sortCols`
    * (a `coalesce(1)` + within-partition sort — NARROW: no exchange
    * anywhere in the job), and every group writes exactly one file whose
    * key range is the union of its members' adjacent ranges — contiguous
    * and non-overlapping across output files, so the scan-pruning the
    * layout bought is preserved (spec-asserted against the
    * `zorder_pruning` inequality).
    *
    * Scale ledger: planning is the same O(files) listing; data is read
    * once and written once with NO shuffle (vs. the round-robin mode's
    * full exchange); each group sorts ~`targetBytes` locally (spill-safe
    * — ExternalSorter spills a group that outgrows executor memory).
    * Group legs are unioned `jobBatch` at a time so the physical plan
    * stays bounded at very large group counts; each batch stages and its
    * files are renamed into one global part sequence, so the output is
    * itself a valid ordered layout (re-compactable, loud-failure
    * preconditions below). Requires a flat directory of files from one sorted write —
    * for a partitioned lakehouse layout, run per partition directory
    * (which is how table-maintenance services schedule compaction anyway).
    *
    * One-partition-per-group mechanics: a `coalesce(1)` leg would be the
    * obvious spelling, but at execution Spark unions same-partitioner
    * coalesced legs partitioner-aware — 8 single-partition legs collapse
    * into ONE output partition/file. Instead each leg scans its group
    * with `spark.sql.files.maxPartitionBytes` raised (scoped to this
    * write, restored after) so the whole group bin-packs into a single
    * scan split naturally — no Repartition node anywhere, the union keeps
    * one partition per group, and each partition writes exactly one file.
    * A pathological single file larger than 4× `targetBytes` still splits
    * (row-group aligned, so each piece covers a contiguous sub-range —
    * ordering survives, just with more output files than planned).
    * Mutating the session's read conf assumes the single-threaded
    * execution Verify/Bench/sbt-test use (same contract as
    * `zorderScratch` above).
    */
  def compactFilesOrdered(s: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, sortCols: Seq[String], jobBatch: Int = 64): Int = {
    require(sortCols.nonEmpty && targetBytes > 0L)
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    // order by the NUMERIC part index, not the file name: zero-padding is
    // only 5 digits, so a >=100k-file write would sort 'part-100000' before
    // 'part-99999' lexicographically and silently group non-adjacent ranges
    val partNum = "part-(\\d+)-.*".r
    val listed = fs.listStatus(inPath).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(listed.nonEmpty, s"no parquet files under $inDir")
    val numbered = listed.map { f =>
      f.getPath.getName match {
        case partNum(n) => (n.toLong, f)
        case other => throw new IllegalArgumentException(
          s"$other does not carry a part index — ordered compaction needs " +
            "the files of ONE sorted/range-partitioned write (part-NNNNN-*)")
      }
    }
    // duplicate part indices mean the directory holds MULTIPLE write jobs
    // (e.g. this function's own multi-batch append output, where every
    // batch restarts at part-00000) — adjacency across jobs is undefined,
    // so grouping would silently interleave unrelated key ranges
    require(numbered.map(_._1).distinct.size == numbered.size,
      s"$inDir contains files from more than one write job (duplicate part " +
        "indices) — name order no longer encodes range order; re-sort the " +
        "table or compact each write's files separately")
    val files = numbered.sortBy(_._1).map(_._2)
    // greedy adjacent bin-packing: close a group when the next file would
    // overflow targetBytes (a single oversized file forms its own group)
    val groups = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    var acc = 0L
    files.foreach { f =>
      if (acc > 0L && acc + f.getLen > targetBytes) {
        groups += scala.collection.mutable.ArrayBuffer.empty[String]
        acc = 0L
      }
      groups.last += f.getPath.toString
      acc += f.getLen
    }
    val schema = s.read.parquet(inDir).schema // stable schema across batches
    val confKeys = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes", "spark.sql.files.minPartitionNum")
    val prev = confKeys.map(k => k -> s.conf.getOption(k))
    s.conf.set(confKeys.head, math.max(4L * targetBytes, 134217728L))
    s.conf.set(confKeys(1), 0L)
    // without this, maxSplitBytes shrinks to totalBytes/defaultParallelism
    // and a group still fans out into several splits/files
    s.conf.set(confKeys(2), 1L)
    // every batch writes into a staging dir and its files are renamed into
    // ONE global part sequence: a naive multi-batch `append` restarts part
    // numbering at part-00000 per job, which would leave the OUTPUT with
    // duplicate part indices — un-re-compactable under the adjacency
    // precondition this function itself enforces above. Renames are
    // metadata ops (parquet footers don't reference file names).
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val outFs = outPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (outFs.exists(outPath)) outFs.delete(outPath, true)
    outFs.mkdirs(outPath)
    val staging = new org.apache.hadoop.fs.Path(outPath, "_staging")
    var seq = 0L
    try groups.toSeq.grouped(jobBatch).foreach { batch =>
      batch.map { paths =>
        s.read.schema(schema).parquet(paths.toSeq: _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(staging.toString)
      val written = outFs.listStatus(staging)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName match {
          case partNum(n) => (n.toLong, f.getPath)
          case other => throw new IllegalStateException(
            s"unrecognized staging file name '$other' — cannot place it in " +
              "the global part sequence")
        })
        .sortBy(_._1) // partition index order = group order within the batch
      written.foreach { case (_, p) =>
        val dest = new org.apache.hadoop.fs.Path(outPath,
          f"part-$seq%09d-graft.snappy.parquet")
        // FileSystem.rename signals failure by returning false (dest exists,
        // parent missing, cross-FS move) — a dropped rename here would lose a
        // whole compacted group silently
        if (!outFs.rename(p, dest))
          throw new java.io.IOException(s"rename $p -> $dest failed")
        seq += 1L
      }
      outFs.delete(staging, true)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
    groups.size
  }

  // -------------------------------------------------- padding-waste curve
  /** Bucket counts evaluated by [[paddingWasteCurve]] — powers of two so
    * each curve point's quantile boundary set contains the previous
    * point's (nested refinement), which is what makes the waste column
    * provably non-increasing down the report. */
  val PaddingBucketCounts: Seq[Int] = Seq(1, 2, 4, 8)

  /** Padding-waste curve for length-bucketed batching — the OTHER answer
    * to heterogeneous document lengths (the alternative pack_sequences
    * sidesteps by concatenation): batch within length buckets and pad
    * every document to its bucket's max. This report is the decision
    * table for the bucket-count knob: for B ∈ [[PaddingBucketCounts]]
    * quantile buckets (thresholds = i/B percentiles of the token count,
    * rounded 4 dp on both engines — the `curriculum_buckets` portable
    * pair), the padded token volume, the real token volume, and the
    * waste share in bp. Because each B's boundary set is nested in the
    * next's, buckets refine and waste is non-increasing in B — the spec
    * asserts the monotonicity, the oracle pins the exact integers.
    *
    * Scale shape: ONE tokenize pass into (doc_id, n) — localCheckpoint'd
    * and reused by all four curve points; per point, one broadcast
    * percentile row, a narrow bucket-assignment projection, and a B-row
    * aggregate (waste per bucket = count·max − sum, so no second per-doc
    * pass); the report is |PaddingBucketCounts| rows. No window over
    * corpus rows anywhere.
    */
  def paddingWasteCurve(s: SparkSession, d: String): DataFrame = {
    val perDoc = Tables.parallelize(s, Tables.documents(s, d)
      .select(size(Portable.tokens(col("text"))).cast("long").as("n")))
      .localCheckpoint()
    val curves = PaddingBucketCounts.map { b =>
      val thresholds = (1 until b).map { i =>
        round(expr(s"percentile(n, ${i.toDouble / b})"), 4).as(s"t$i")
      }
      val bucketed =
        if (b == 1) perDoc.select(col("n"), lit(1).as("bucket"))
        else {
          val q = perDoc.agg(thresholds.head, thresholds.tail: _*)
          perDoc.crossJoin(broadcast(q))
            .select(col("n"),
              (1 until b).map(i => (col("n") > col(s"t$i")).cast("int"))
                .foldLeft(lit(1))(_ + _).as("bucket"))
        }
      bucketed.groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), sum("n").as("real"), max("n").as("bmax"))
        .agg(
          coalesce(sum(col("cnt") * col("bmax")), lit(0L)).as("padded_tokens"),
          coalesce(sum("real"), lit(0L)).as("real_tokens"))
        .select(lit(b).as("n_buckets"), col("padded_tokens"), col("real_tokens"),
          (col("padded_tokens") - col("real_tokens")).as("waste_tokens"),
          expr("(padded_tokens - real_tokens) * 10000 div greatest(padded_tokens, 1L)")
            .as("waste_bp"))
    }
    curves.reduce(_ unionAll _).orderBy("n_buckets")
  }

  val paddingWasteCurveSql: String = {
    def point(b: Int): String =
      if (b == 1)
        // coalesce mirrors the Column tree's coalesce(sum(...), 0L): on an
        // EMPTY corpus max(n)/sum(n) are NULL and the engines would diverge
        """SELECT 1 AS n_buckets,
          |  CAST(coalesce(count(*) * max(n), 0) AS BIGINT) AS padded_tokens,
          |  CAST(coalesce(sum(n), 0) AS BIGINT) AS real_tokens FROM t""".stripMargin
      else {
        val thr = (1 until b).map(i =>
          s"round(quantile_cont(n, ${i.toDouble / b}), 4) AS t$i").mkString(", ")
        val assign = (1 until b).map(i =>
          s"(CASE WHEN n > (SELECT t$i FROM q$b) THEN 1 ELSE 0 END)")
          .mkString("1 + ", " + ", "")
        s"""SELECT $b AS n_buckets,
           |  CAST(coalesce(sum(cnt * bmax), 0) AS BIGINT) AS padded_tokens,
           |  CAST(coalesce(sum(realv), 0) AS BIGINT) AS real_tokens
           |FROM (
           |  SELECT bucket, count(*) AS cnt, sum(n) AS realv, max(n) AS bmax
           |  FROM (SELECT n, $assign AS bucket FROM t) GROUP BY bucket)""".stripMargin
      }
    val qCtes = PaddingBucketCounts.filter(_ > 1).map { b =>
      val thr = (1 until b).map(i =>
        s"round(quantile_cont(n, ${i.toDouble / b}), 4) AS t$i").mkString(", ")
      s"q$b AS (SELECT $thr FROM t)"
    }.mkString(",\n")
    val points = PaddingBucketCounts.map(point).mkString("\nUNION ALL\n")
    s"""WITH t AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |  FROM documents),
       |$qCtes
       |SELECT n_buckets, padded_tokens, real_tokens,
       |  CAST(padded_tokens - real_tokens AS BIGINT) AS waste_tokens,
       |  CAST((padded_tokens - real_tokens) * 10000
       |    // greatest(padded_tokens, 1) AS BIGINT) AS waste_bp
       |FROM ($points)
       |ORDER BY n_buckets""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "assign_row_ids" -> (assignRowIds _),
    "pack_sequences" -> (packSequences _),
    "pack_efficiency" -> (packEfficiency _),
    "padding_waste_curve" -> (paddingWasteCurve _),
    "zorder_layout" -> (zorderLayout _),
    "zorder_pruning" -> (zorderPruning _))

  def oracles: Map[String, String] = Map(
    "assign_row_ids" -> assignRowIdsSql,
    "pack_sequences" -> packSequencesSql,
    "pack_efficiency" -> packEfficiencySql,
    "padding_waste_curve" -> paddingWasteCurveSql,
    "zorder_layout" -> zorderLayoutSql,
    "zorder_pruning" -> zorderPruningSql)
}
