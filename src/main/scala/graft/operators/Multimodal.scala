package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder north star): media payloads are
  * opaque `binary` columns with typed metadata alongside. The container has
  * no image/audio codecs, so the decode step is a clearly-marked
  * deterministic STUB — but the Spark-side shape is real: binary columns,
  * per-batch `mapPartitions` decode (the Scala analogue of `mapInPandas`
  * batch UDFs), chunking for fixed-size transport, and content hashing.
  *
  * At scale the binary column rides the same parquet row groups as the
  * metadata; nothing here ever collects to the driver, and the decode stub
  * runs per-partition exactly where a real codec would.
  */
object Multimodal {

  /** One decoded media record (what a real image decode would yield). */
  case class DecodedMedia(doc_id: Long, width: Int, height: Int, n_frames: Int)

  /** STUB decode: derives fake dimensions from the payload bytes.
    * A real deployment would replace the body with an actual codec call;
    * the signature (bytes in, typed record out, executed inside
    * `mapPartitions` batches) is the real contract.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): DecodedMedia = {
    val first = if (payload.nonEmpty) payload(0) & 0xff else 0
    DecodedMedia(
      doc_id = docId,
      width = 64 + first % 64,
      height = 64 + (payload.length % 64),
      n_frames = 1 + payload.length % 5)
  }

  /** Binary ingest + metadata: text → UTF-8 binary payload (standing in for
    * a media blob) with byte length and SHA-256 content hash.
    */
  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("content_sha256"))
      .orderBy("doc_id")

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS INTEGER) AS byte_len,
      |  sha256(text) AS content_sha256
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-partition decode via the stub — the `mapPartitions` batch shape a
    * real codec plugs into. Output is ordinary columns, so downstream
    * relational ops (and the oracle) see a plain table.
    */
  def multimodalDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.parallelize(s, Tables.documents(s, d))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
      .orderBy("doc_id")
  }

  val multimodalDecodeSql: String =
    """SELECT doc_id,
      |  CAST(64 + ascii(substring(text, 1, 1)) % 64 AS INTEGER) AS width,
      |  CAST(64 + length(text) % 64 AS INTEGER) AS height,
      |  CAST(1 + length(text) % 5 AS INTEGER) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Fixed-size chunking (256-byte frames) of the binary payload — the
    * "frame sample" shape for transport/storage of large media, with a
    * per-chunk content hash.
    */
  /** THE per-chunk relation `(doc_id, chunk_idx, chunk_len, chunk_md5)` —
    * shared by [[multimodalChunks]] and [[multimodalChunkDedup]] so both
    * mean the same thing by "chunk". */
  private def chunkFrame(s: SparkSession, d: String): DataFrame = {
    Tables.tuneSession(s) // chunk transform array gets exploded
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        ceil(length(col("text")).cast("double") / 256).cast("int").as("n_chunks"))
      .select(col("doc_id"),
        // Guard n_chunks = 0: sequence(0, -1) defaults to step -1 and emits
        // [0, -1], which would fabricate two chunks for an empty payload;
        // the oracle's range(0, 0) emits none. Empty docs → empty array →
        // posexplode drops the row, matching the oracle.
        posexplode(when(col("n_chunks") > 0, expr(
          "transform(sequence(0, n_chunks - 1), i -> substr(text, i * 256 + 1, 256))"))
          .otherwise(expr("CAST(array() AS array<string>)")))
          .as(Seq("chunk_idx", "chunk")))
      .select(
        col("doc_id"), col("chunk_idx"),
        length(col("chunk")).as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
  }

  def multimodalChunks(s: SparkSession, d: String): DataFrame =
    chunkFrame(s, d).orderBy("doc_id", "chunk_idx")

  /** Content-defined chunk dedup over the media payloads — the
    * storage-dedup report every blob store runs (and the media analog of
    * `dedup_spans`): a chunk is SHARED when its content hash occurs at
    * more than one (doc, position) in the corpus, so a content store
    * keeping one copy per distinct hash saves exactly the shared bytes.
    * Per payload: chunk count, shared-chunk count, shared share in
    * integer basis points, and the bytes a dedup store would not have to
    * hold for this payload (its occurrences of multi-occurrence chunks
    * beyond the canonical copy are FREE only once corpus-wide, so the
    * per-doc column counts bytes of chunks whose hash also occurs
    * elsewhere — the upper bound a per-doc report can state without
    * choosing a canonical owner).
    *
    * Shape at scale: one chunking pass, one chunk-hash-keyed exchange
    * for occurrence counts (partial+final), one doc_id rollup — the
    * dedup_spans cost envelope with hashes instead of token spans.
    */
  def multimodalChunkDedup(s: SparkSession, d: String): DataFrame = {
    val chunks = chunkFrame(s, d).localCheckpoint()
    val occ = chunks.groupBy("chunk_md5").agg(count(lit(1)).as("occ"))
    chunks.join(occ, "chunk_md5")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("shared_chunks"),
        sum(when(col("occ") > 1, col("chunk_len").cast("long")).otherwise(0L))
          .as("shared_bytes"))
      .withColumn("shared_bp",
        expr("(shared_chunks * 10000) div greatest(n_chunks, 1L)"))
      .orderBy("doc_id")
  }

  val multimodalChunkDedupSql: String =
    """WITH c AS (
      |  SELECT doc_id, text,
      |    CAST(ceil(CAST(length(text) AS DOUBLE) / 256) AS INTEGER) AS n_chunks
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_idx, text
      |  FROM c),
      |ch AS (
      |  SELECT doc_id,
      |    length(substring(text, chunk_idx * 256 + 1, 256)) AS chunk_len,
      |    md5(substring(text, chunk_idx * 256 + 1, 256)) AS chunk_md5
      |  FROM e),
      |occ AS (SELECT chunk_md5, count(*) AS occ FROM ch GROUP BY 1)
      |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN occ.occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS shared_chunks,
      |  CAST(sum(CASE WHEN occ.occ > 1 THEN ch.chunk_len ELSE 0 END) AS BIGINT)
      |    AS shared_bytes,
      |  CAST(sum(CASE WHEN occ.occ > 1 THEN 1 ELSE 0 END) * 10000
      |    // greatest(count(*), 1) AS BIGINT) AS shared_bp
      |FROM ch JOIN occ USING (chunk_md5)
      |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin

  val multimodalChunksSql: String =
    """WITH c AS (
      |  SELECT doc_id, text,
      |    CAST(ceil(CAST(length(text) AS DOUBLE) / 256) AS INTEGER) AS n_chunks
      |  FROM documents),
      |e AS (
      |  SELECT doc_id,
      |    unnest(range(0, n_chunks)) AS chunk_idx,
      |    text
      |  FROM c)
      |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
      |  CAST(length(substring(text, chunk_idx * 256 + 1, 256)) AS INTEGER) AS chunk_len,
      |  md5(substring(text, chunk_idx * 256 + 1, 256)) AS chunk_md5
      |FROM e ORDER BY doc_id, chunk_idx""".stripMargin

  /** Aspect-preserving resize planning — the geometry every vision
    * preprocessing pipeline computes before the pixel pass: fit the
    * decoded (width, height) into a 224×224 training box scaled by the
    * LARGER dimension, and report the letterbox padding. All integer
    * arithmetic ((dim × 224) div max-dim — no float scale factors, so
    * the contract has no rounding semantics), chained directly onto the
    * `mapPartitions` decode stub: decode → geometry is one narrow
    * distributed pass, and a real resizer consumes (out_w, out_h,
    * pad_x, pad_y) per record exactly as emitted here.
    */
  /** THE definition of the fit-to-224-box geometry — appends (out_w,
    * out_h, pad_x, pad_y) to any frame carrying integer (width, height);
    * shared by [[multimodalResize]] and the streaming ingest
    * (`Streams.mediaIngestBatch`), so ingest-time and batch-time
    * geometry cannot drift — the one-definition discipline of
    * `bm25ScoreTail`/`coverageTail`. */
  def resizeGeometry(decoded: DataFrame): DataFrame =
    decoded
      .withColumn("__m", greatest(col("width"), col("height")))
      .withColumn("out_w", expr("(width * 224) div __m"))
      .withColumn("out_h", expr("(height * 224) div __m"))
      .drop("__m")
      .withColumn("pad_x", lit(224L) - col("out_w"))
      .withColumn("pad_y", lit(224L) - col("out_h"))

  def multimodalResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    resizeGeometry(
      Tables.parallelize(s, Tables.documents(s, d))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
        .toDF()
        .select(col("doc_id"), col("width"), col("height")))
      .orderBy("doc_id")
  }

  val multimodalResizeSql: String =
    """WITH dec AS (
      |  SELECT doc_id,
      |    CAST(64 + ascii(substring(text, 1, 1)) % 64 AS INTEGER) AS width,
      |    CAST(64 + length(text) % 64 AS INTEGER) AS height
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, width, height, greatest(width, height) AS m FROM dec)
      |SELECT doc_id, width, height,
      |  CAST((width * 224) // m AS BIGINT) AS out_w,
      |  CAST((height * 224) // m AS BIGINT) AS out_h,
      |  CAST(224 - (width * 224) // m AS BIGINT) AS pad_x,
      |  CAST(224 - (height * 224) // m AS BIGINT) AS pad_y
      |FROM g ORDER BY doc_id""".stripMargin

  /** Uniform frame sampling — the video-side decimation every multimodal
    * training pipeline runs (k frames per clip, evenly spaced): from the
    * decoded frame count, select up to 3 frames at indices
    * (ord × n) div k (integer arithmetic), with the 25-fps timestamp of
    * each selected frame. The explode is a per-row array transform — one
    * narrow pass after the decode, rows out ∝ k per clip, never frames².
    */
  def multimodalFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.tuneSession(s) // frame-index arrays get exploded
    Tables.parallelize(s, Tables.documents(s, d))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
      .select(col("doc_id"), col("n_frames"),
        least(lit(3), col("n_frames")).as("k"))
      .select(col("doc_id"), col("n_frames"),
        posexplode(expr(
          "transform(sequence(0, k - 1), i -> (i * n_frames) div k)"))
          .as(Seq("frame_ord", "frame_idx")))
      .select(col("doc_id"), col("n_frames"), col("frame_ord"),
        col("frame_idx"), (col("frame_idx") * 40L).as("ts_ms"))
      .orderBy("doc_id", "frame_ord")
  }

  val multimodalFrameSampleSql: String =
    """WITH dec AS (
      |  SELECT doc_id, CAST(1 + length(text) % 5 AS INTEGER) AS n_frames
      |  FROM documents),
      |kk AS (SELECT doc_id, n_frames, least(3, n_frames) AS k FROM dec),
      |e AS (
      |  SELECT doc_id, n_frames, k, unnest(range(0, k)) AS frame_ord FROM kk)
      |SELECT doc_id, n_frames, CAST(frame_ord AS INTEGER) AS frame_ord,
      |  CAST((frame_ord * n_frames) // k AS BIGINT) AS frame_idx,
      |  CAST((frame_ord * n_frames) // k * 40 AS BIGINT) AS ts_ms
      |FROM e ORDER BY doc_id, frame_ord""".stripMargin

  /** STUB feature extraction: an 8-dim pseudo-embedding from the payload's
    * leading bytes (a real model would replace the arithmetic; the batch
    * iterator shape and `array<float>` output schema are the contract).
    * Bridges the multimodal path into the similarity operators — the
    * emitted column is directly consumable by `vec_dot`/ANN.
    */
  def featureStub(payload: Array[Byte]): Array[Float] = {
    val dim = 8
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      // raw byte values: integers <= 255 are exact in float32, so all
      // downstream double math is bit-identical to the SQL oracle's
      out(i) = (if (i < payload.length) (payload(i) & 0xff) else 0).toFloat
      i += 1
    }
    out
  }

  /** Per-partition feature extraction over binary payloads, then an L2 norm
    * via the native `vec_norm` expression — decode→embed→vector-math, the
    * full multimodal pipeline shape, with every step distributed.
    */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.VecFunctions.register(s)
    Tables.parallelize(s, Tables.documents(s, d))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, featureStub(bytes)) })
      .toDF("doc_id", "feature")
      .select(col("doc_id"),
        round(element_at(col("feature"), 1).cast("double") / 255.0, 6).as("f0"),
        round(expr("vec_norm(feature)"), 6).as("fnorm"))
      .orderBy("doc_id")
  }

  val multimodalFeaturesSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    list_transform(range(1, 9),
      |      i -> CASE WHEN i <= length(text)
      |                THEN CAST(ascii(substring(text, CAST(i AS INTEGER), 1)) AS DOUBLE)
      |                ELSE 0.0 END) AS feature
      |  FROM documents)
      |SELECT doc_id,
      |  round(feature[1] / 255.0, 6) AS f0,
      |  round(sqrt(list_sum(list_transform(feature, x -> x * x))), 6) AS fnorm
      |FROM f ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_chunks" -> (multimodalChunks _),
    "multimodal_chunk_dedup" -> (multimodalChunkDedup _),
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_resize" -> (multimodalResize _),
    "multimodal_framesample" -> (multimodalFrameSample _))

  def oracles: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaSql,
    "multimodal_decode" -> multimodalDecodeSql,
    "multimodal_chunks" -> multimodalChunksSql,
    "multimodal_chunk_dedup" -> multimodalChunkDedupSql,
    "multimodal_features" -> multimodalFeaturesSql,
    "multimodal_resize" -> multimodalResizeSql,
    "multimodal_framesample" -> multimodalFrameSampleSql)
}
