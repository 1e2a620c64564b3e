package graft.models

import org.apache.spark.sql.SparkSession

/** The ONE persisted-model contract (SURVEY §2 serving splits; VERDICT r10
  * item 5). Every `write*` training path writes a `manifest.json` at the
  * model-dir root — schema version, model kind, source-corpus dir +
  * tables + file-metadata fingerprint, and the training params that must
  * match between trainer and server — and every `*FromModel` /
  * `*FromIndex` / `*FromLabels` serving path validates it before reading
  * a byte of model data:
  *
  *   - missing manifest, wrong kind, or wrong schema version → loud
  *     `IllegalStateException` naming the dir and what was expected —
  *     pointing a server at the wrong artifact class fails immediately
  *     instead of producing silently-wrong scores;
  *   - for servers whose contract requires the SERVING corpus to be the
  *     TRAINING corpus (cluster labels, the incremental-dedup history
  *     index), a changed corpus fingerprint → loud staleness error
  *     naming both fingerprints — stale labels can never silently
  *     mislabel a grown corpus.
  *
  * The fingerprint is file metadata (count, total bytes, max mtime) per
  * table — the same bounded `listFiles` walk the ANN codebook cache
  * already trusts (`Similarity.corpusStamp`), O(files) with zero data
  * reads, valid at any corpus size. Manifest I/O goes through the
  * Hadoop FileSystem API, so model dirs work on any Spark-supported
  * filesystem, not just local disk.
  */
object ModelManifest {
  val SchemaVersion = 1
  val FileName = "manifest.json"

  /** File-metadata fingerprint of `tables` under `sfDir` — one
    * `name:count-bytes-maxMtime` segment per table, order-stable. */
  def corpusFingerprint(s: SparkSession, sfDir: String,
      tables: Seq[String]): String =
    tables.sorted.map { t =>
      val path = new org.apache.hadoop.fs.Path(s"$sfDir/$t.parquet")
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) s"$t:absent"
      else {
        val it = fs.listFiles(path, true)
        var len = 0L; var mt = 0L; var n = 0
        while (it.hasNext) {
          val f = it.next(); len += f.getLen
          mt = math.max(mt, f.getModificationTime); n += 1
        }
        s"$t:$n-$len-$mt"
      }
    }.mkString(";")

  private def jstr(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Retrain-safety gate: delete any EXISTING manifest before the model
    * parquet writes start. Every `write*` path calls this first, so the
    * interrupted-retrain window is closed from both sides — a crash
    * before the data writes finish leaves a dir with no manifest (the
    * old one is already gone), and a crash before [[write]] runs leaves
    * the same; either way [[validate]] refuses the dir. Without this, a
    * crash mid-retrain left the OLD valid manifest over
    * partially-rewritten data, and an unchanged corpus made even the
    * fingerprint check pass (ADVICE r11). */
  def invalidate(s: SparkSession, modelDir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$modelDir/$FileName")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, false)
  }

  /** Write the manifest for a model trained from `tables` under `sfDir`.
    * Call AFTER the model parquet writes succeed (and [[invalidate]]
    * BEFORE they start): a crashed training run
    * leaves no manifest, and the serving path refuses the partial dir. */
  def write(s: SparkSession, modelDir: String, kind: String, sfDir: String,
      tables: Seq[String], params: Seq[(String, String)] = Nil): Unit = {
    val body =
      s"""{
         |  "schema_version": $SchemaVersion,
         |  "kind": ${jstr(kind)},
         |  "source_dir": ${jstr(sfDir)},
         |  "tables": [${tables.sorted.map(jstr).mkString(", ")}],
         |  "corpus_fingerprint": ${jstr(corpusFingerprint(s, sfDir, tables))},
         |  "params": {${params.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString(", ")}}
         |}
         |""".stripMargin
    val path = new org.apache.hadoop.fs.Path(s"$modelDir/$FileName")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Parsed manifest contents. */
  final case class Manifest(schemaVersion: Int, kind: String,
      sourceDir: String, tables: Seq[String], corpusFingerprint: String,
      params: Map[String, String])

  private def read(s: SparkSession, modelDir: String): Option[Manifest] = {
    val path = new org.apache.hadoop.fs.Path(s"$modelDir/$FileName")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toByteArray
        } finally in.close()
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(bytes)
      val tb = Seq.newBuilder[String]
      root.path("tables").forEach(t => tb += t.asText())
      val pb = Map.newBuilder[String, String]
      val it = root.path("params").properties().iterator()
      while (it.hasNext) { val e = it.next(); pb += e.getKey -> e.getValue.asText() }
      Some(Manifest(root.path("schema_version").asInt(-1),
        root.path("kind").asText(""), root.path("source_dir").asText(""),
        tb.result(), root.path("corpus_fingerprint").asText(""), pb.result()))
    }
  }

  /** Serving-side gate: the dir must hold a current-schema manifest of
    * the expected kind. Returns the manifest so servers can consume the
    * persisted training params instead of re-assuming them. */
  def validate(s: SparkSession, modelDir: String, kind: String): Manifest =
    read(s, modelDir) match {
      case None => throw new IllegalStateException(
        s"model dir $modelDir has no $FileName — not a graft model artifact, " +
          s"or a partial training run; retrain via the matching write* path " +
          s"(expected kind '$kind')")
      case Some(m) if m.kind != kind => throw new IllegalStateException(
        s"model dir $modelDir holds kind '${m.kind}' but the serving path " +
          s"expects '$kind' — wrong artifact wired to this server")
      case Some(m) if m.schemaVersion != SchemaVersion =>
        throw new IllegalStateException(
          s"model dir $modelDir has manifest schema ${m.schemaVersion}; this " +
            s"build reads schema $SchemaVersion — retrain or migrate the artifact")
      case Some(m) => m
    }

  /** [[validate]] plus the staleness gate for servers that must run
    * against the corpus the model was trained on: the CURRENT fingerprint
    * of the manifest's tables under `sfDir` must equal the fingerprint
    * recorded at training time. */
  def validateAgainstCorpus(s: SparkSession, modelDir: String, kind: String,
      sfDir: String): Manifest = {
    val m = validate(s, modelDir, kind)
    val now = corpusFingerprint(s, sfDir, m.tables)
    if (now != m.corpusFingerprint) throw new IllegalStateException(
      s"STALE model: $kind at $modelDir was trained on " +
        s"'${m.corpusFingerprint}' (${m.sourceDir}) but $sfDir is now " +
        s"'$now' — the corpus changed since training; retrain before serving")
    m
  }
}
