package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram (shingle) expression over a token-array column:
  * element i of the result is tokens i..i+n−1 joined by single spaces;
  * empty array when the document has fewer than n tokens. Byte-identical
  * to the declarative formulation it replaces
  * (`transform(sequence(...), i -> concat_ws(" ", w[i], ...))`) — which the
  * DuckDB oracle mirrors as `list_transform(range(...), ...)` — but one
  * tight per-row loop instead of an interpreted higher-order lambda doing
  * n array lookups and a varargs concat per element. Shared by every
  * gram-based operator (jaccard, MinHash+LSH, clusters, decontamination).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= cnt - n) {
      var k = 0
      while (k < n) { window(k) = arr.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concatWs(space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
