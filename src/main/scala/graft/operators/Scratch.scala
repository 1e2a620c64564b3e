package graft.operators

/** Per-JVM scratch directories for operators that materialize local
  * artifacts (z-order layout proofs, persisted dedup indexes). One temp
  * parent per call site per JVM, deleted best-effort by a shutdown hook —
  * so repeated Bench/Verify/test invocations cannot accumulate trees in
  * `java.io.tmpdir` across JVMs, and concurrent JVMs never share a path.
  */
private[graft] object Scratch {

  /** Create a fresh temp parent and register its JVM-exit cleanup. The
    * hook catches all non-fatal throwables, not just `IOException`:
    * `Files.walk`'s iterator surfaces races (an entry deleted under it by
    * another exiting component or an OS tmp cleaner) as
    * `UncheckedIOException`, a RuntimeException — cleanup must stay
    * best-effort through those, not abort the shutdown-hook thread. */
  def tempParent(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      try java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount) // children before parents
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    p
  }
}
