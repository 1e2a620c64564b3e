package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels as native expressions.
  *
  * Why these exist: the PQ encode/ADC queries were first written as pure
  * Column trees — 8 subspaces × 16 centroids × 8 dims of
  * `(v[i] - c)·(v[i] - c)` terms, the distance array built twice for the
  * argmin — which is ~12k expression nodes per projection. That tree
  * overflows janino's 64 KB method limit ("Code grows beyond 64 KB"), so
  * whole-stage codegen was silently disabled and the whole stage ran on
  * the interpreted evaluator; plan construction and codegen attempts alone
  * dominated wall time at fixture scale (6.5 s for a 500-row input). The
  * same computation as a tight primitive loop over a static codebook table
  * is two expression nodes, keeps the surrounding stage inside whole-stage
  * codegen, and is the shape that encodes a 100 TB corpus: one kernel call
  * per row, no per-term expression overhead (the [[FloatVecDot]] lesson,
  * SURVEY.md §7.3).
  *
  * Arithmetic parity with the DuckDB oracle is preserved exactly: distances
  * accumulate `e*e` sequentially dim by dim, the argmin keeps the FIRST
  * minimal centroid (strict `<`, matching `list_position(d, list_min(d))`),
  * and the reconstruction error sums subspace minima in subspace order.
  */
object PqKernels {
  val Subspaces = 8
  val Centroids = 16
  val Dims = 8 // 64 / Subspaces

  /** Portable pseudo-random centroid component for (subspace s, centroid j,
    * dim i), in [-0.35, 0.35) — the md5 derivation shared with the SQL
    * oracle (`Similarity.pqCentroid` delegates here; one derivation, two
    * engines).
    */
  def centroid(s: Int, j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"pq_${s}_${j}_$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(7)
    ((java.lang.Long.parseLong(hex, 16) % 2000001L) / 1000000.0 - 1.0) * 0.35
  }

  /** Codebook flattened as [s][j][i] → s·Centroids·Dims + j·Dims + i. */
  lazy val flat: Array[Double] = {
    val a = new Array[Double](Subspaces * Centroids * Dims)
    var s = 0
    while (s < Subspaces) {
      var j = 0
      while (j < Centroids) {
        var i = 0
        while (i < Dims) {
          a(s * Centroids * Dims + j * Dims + i) = centroid(s, j, i)
          i += 1
        }
        j += 1
      }
      s += 1
    }
    a
  }

  private def wellFormed(emb: ArrayData): Boolean = {
    if (emb == null || emb.numElements() != Subspaces * Dims) return false
    var k = 0
    while (k < Subspaces * Dims) {
      if (emb.isNullAt(k)) return false
      k += 1
    }
    true
  }

  /** All-subspace encode: (codes[8], reconstruction error) in one pass.
    * Returns null for a malformed embedding (wrong length / null element).
    */
  def encode(emb: ArrayData): InternalRow = {
    if (!wellFormed(emb)) return null
    val tab = flat
    val codes = new Array[Int](Subspaces)
    var err = 0.0
    var s = 0
    while (s < Subspaces) {
      var best = Double.PositiveInfinity
      var bi = 0
      var j = 0
      while (j < Centroids) {
        var acc = 0.0
        var i = 0
        while (i < Dims) {
          val e = emb.getFloat(s * Dims + i).toDouble -
            tab(s * Centroids * Dims + j * Dims + i)
          acc += e * e
          i += 1
        }
        if (acc < best) { best = acc; bi = j }
        j += 1
      }
      codes(s) = bi
      err += best
      s += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), err))
  }

  /** ADC distance tables: per subspace, the 16 centroid distances — the
    * query-side lookup structure, 128 doubles regardless of corpus size.
    */
  def distTables(emb: ArrayData): ArrayData = {
    if (!wellFormed(emb)) return null
    val tab = flat
    val tables = new Array[Any](Subspaces)
    var s = 0
    while (s < Subspaces) {
      val d = new Array[Double](Centroids)
      var j = 0
      while (j < Centroids) {
        var acc = 0.0
        var i = 0
        while (i < Dims) {
          val e = emb.getFloat(s * Dims + i).toDouble -
            tab(s * Centroids * Dims + j * Dims + i)
          acc += e * e
          i += 1
        }
        d(j) = acc
        j += 1
      }
      tables(s) = new GenericArrayData(d)
      s += 1
    }
    new GenericArrayData(tables)
  }
}

/** `pq_encode(embedding)` → struct(codes: array<int>, recon_err: double).
  * Codegen emits one static kernel call, so the surrounding stage stays in
  * whole-stage codegen (vs the 12k-node Column tree it replaces, which
  * overflowed janino's 64 KB method limit and forced interpreted eval).
  */
case class PqEncodeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("recon_err", DoubleType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PqKernels.encode($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_dist_tables(embedding)` → array<array<double>> (8 subspaces × 16
  * centroid distances), the query-side ADC lookup structure. Same codegen
  * rationale as [[PqEncodeExpr]].
  */
case class PqDistTablesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullable: Boolean = true
  override def prettyName: String = "pq_dist_tables"

  override def nullSafeEval(v: Any): Any =
    PqKernels.distTables(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PqKernels.distTables($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
