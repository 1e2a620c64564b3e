package graft.models

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared filesystem choreography for offline maintenance of GROWN
  * persisted indexes (`TextAnalysis.compactEditIndex`,
  * `Similarity.compactAnnIndex`): fold streaming appends back into the
  * base relation with a staged write + rename swap, under the manifest
  * invalidate-first / rewrite-last bracket the caller owns. Rename is
  * the atomic primitive HDFS-like stores give us — an interruption at
  * any point leaves either the old tree or a manifest-less dir, both of
  * which every serving path refuses or survives.
  */
private[graft] object IndexMaintenance {

  def exists(s: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Replace `dir/sub` with freshly-written content: `writeStaged` writes
    * to a sibling staging path, which is swapped in by delete + rename;
    * `alsoDelete` subtrees (the folded-in appends) are removed after the
    * swap. Finishes by refreshing the session's path caches for `dir` —
    * a serving session may hold the pre-compaction relation persisted,
    * and the cache manager would otherwise satisfy a fresh read of the
    * same path from that stale plan. */
  def stagedSwap(s: SparkSession, dir: String, sub: String,
      alsoDelete: Seq[String])(writeStaged: String => Unit): Unit = {
    val live = new Path(s"$dir/$sub")
    val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
    val staged = new Path(s"$dir/$sub.compacting")
    writeStaged(staged.toString)
    fs.delete(live, true)
    fs.rename(staged, live)
    alsoDelete.foreach(p => fs.delete(new Path(s"$dir/$p"), true))
    s.catalog.refreshByPath(dir)
  }

  /** The rewritten manifest's params: the old params with the
    * `compactions` counter bumped — the audit trail of how many folds
    * this index has absorbed since its last full rebuild. */
  def bumpCompactions(m: ModelManifest.Manifest): Seq[(String, String)] =
    (m.params + ("compactions" ->
      (m.params.getOrElse("compactions", "0").toInt + 1).toString)).toSeq

  /** The retrained manifest's params: `retrains` bumped, the structural
    * params the rebuild changed (e.g. the adaptive codebook size)
    * overwritten, and `compactions` RESET — a retrain is a full rebuild,
    * so the fold count it audited starts over. */
  def bumpRetrains(m: ModelManifest.Manifest,
      updated: (String, String)*): Seq[(String, String)] =
    (m.params ++ updated +
      ("retrains" -> (m.params.getOrElse("retrains", "0").toInt + 1).toString) -
      "compactions").toSeq
}
