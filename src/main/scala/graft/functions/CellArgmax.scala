package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StructField, StructType}

/** Native IVF cell argmax over a DRIVER-HELD codebook: for one vector
  * `(embedding, nrm)`, return `struct(cell, csim)` of the centroid with
  * the highest cosine, ties to the LOWER cell id — exactly the
  * `max(struct(sim, -cid, ...))` reduction of the broadcast-join
  * assignment path, computed in one tight loop per row.
  *
  * Why it exists (r15): the join path materializes n×k candidate ROWS
  * through a map-side-combining max — 7.35 BILLION rows at the ×300
  * drill (3M vectors × 2449 cells), where per-row plumbing, not the
  * dot-product arithmetic, was the measured dominant term of every
  * big-k family (semdedup prune, trained-IVF builds). This expression
  * keeps the relation at n rows and runs the k×64 multiply-adds as a
  * plain JVM loop over a codebook embedded in the expression tree (one
  * serialized object, NOT k literal sub-expressions — the janino
  * method-size ceiling that capped the literal-`greatest` path at 64
  * cells does not apply).
  *
  * Value parity with the join path, term by term:
  *  - dot = [[FloatVecDot]]'s exact sequential accumulation
  *    (`acc += x(i).toDouble * y(i).toDouble`);
  *  - cnrm = `sqrt(Σ c(i)² as double)` — the same double arithmetic
  *    `centsFrame` precomputes;
  *  - comparison = Spark struct order on `(sim desc, -cid desc)`:
  *    `java.lang.Double.compare` (NaN greater than everything, ties →
  *    lower cid);
  *  - a length-mismatched embedding (vec_dot → NULL) can never win a
  *    cell. INTENTIONAL divergence on the degenerate all-mismatch case
  *    (an embedding whose length matches NO centroid — unreachable with
  *    the fixed 64-dim codebooks): this expression yields NULL overall,
  *    where the old broadcast-join's max-over-structs picked the lowest
  *    cid with a null sim. NULL is the honest answer for "no cell could
  *    score this vector"; downstream consumers groupBy(cell) and a null
  *    cell groups the malformed rows visibly instead of silently
  *    attributing them to cell 0.
  */
case class CellArgmax(left: Expression, right: Expression,
    cents: Array[(Int, Array[Float])])
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))
  override def prettyName: String = "cell_argmax"
  override def nullable: Boolean = true

  @transient private lazy val cnrms: Array[Double] =
    cents.map { case (_, c) =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(emb: Any, nrmAny: Any): Any = {
    // hoist ONE primitive copy of the embedding before the cell loop:
    // reading through ArrayData.getFloat inside it is k×dim virtual
    // dispatches per row over the same 64 floats (40k at the ×100 drill's
    // k=633 — measured ~1.7× on the whole semdedup pass), and a primitive
    // array lets the JIT keep the dot loop tight
    val xa = emb.asInstanceOf[ArrayData].toFloatArray()
    val nrm = nrmAny.asInstanceOf[Double]
    val n = xa.length
    var bestCid = Int.MinValue
    var bestSim = 0.0
    var found = false
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)._2
      if (cent.length == n) {
        var acc = 0.0
        var i = 0
        while (i < n) { acc += xa(i).toDouble * cent(i).toDouble; i += 1 }
        val sim = acc / (nrm * cnrms(c))
        val cid = cents(c)._1
        val cmp = java.lang.Double.compare(sim, bestSim)
        if (!found || cmp > 0 || (cmp == 0 && cid < bestCid)) {
          bestCid = cid; bestSim = sim; found = true
        }
      }
      c += 1
    }
    if (!found) null else InternalRow(bestCid, bestSim)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
