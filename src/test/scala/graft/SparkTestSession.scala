package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (getOrCreate → same JVM session). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"

  /** Recursive delete for spec scratch dirs — repeated test runs hold
    * steady-state disk instead of accumulating temp parquet trees (the
    * `Packing.zorderScratchParent` discipline, applied to per-test dirs). */
  def deleteRecursively(dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally walk.close()
    }
  }

  /** Root paths of every parquet relation in a frame's optimized plan —
    * the plan-pinning helper the model-serving specs (`LmModelSpec`,
    * `Bm25ModelSpec`, `ClusterLabelsSpec`, …) use to prove a serving
    * plan reads only its model artifacts + probes.
    */
  def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case _ => ""
        }
    }

  /** A second session on the RocksDB state-store provider (required by
    * transformWithState), without disturbing the shared default/active
    * session. Shared by the stateful-processor suites.
    */
  def rocksDbSession(appName: String): SparkSession = {
    val _ = spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try SparkSession.builder()
      .master("local[2]")
      .appName(appName)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
