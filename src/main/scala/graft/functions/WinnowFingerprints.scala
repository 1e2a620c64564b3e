package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint expression (Schleimer–Wilkerson–Aiken)
  * over a text column: hash every k-char window to the 28-bit md5-derived
  * portable value `conv(substring(md5(substring(text, i, k)), 1, 7), 16,
  * 10)`, slide a w-hash window over the sequence keeping each window's
  * minimum, return the DISTINCT minima. VALUE-identical to the
  * declarative formulation it replaces — the same md5 family the DuckDB
  * oracles recompute — but one tight per-row loop (reused digest, byte
  * windows, monotonic-deque sliding minimum) instead of ~len interpreted
  * `slice` + `array_min` array allocations per document: the bisected
  * dominant term of the ×100 winnow drill (fingerprints alone were ~95%
  * of dedup_winnow's wall time; the [[WordShingles]] lesson applied to
  * hashing).
  *
  * Fewer than k+w−1 chars ⇒ empty array (callers also pre-filter, the
  * established gate). ASCII documents hash straight off the byte array;
  * any multi-byte text falls back to per-window character substrings —
  * the same UTF-8 bytes Spark's `md5(substring(...))` digests, so the
  * fast path is an optimization, never a semantic fork.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && w > 0, "window sizes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  @transient private lazy val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val nChars = text.numChars()
    if (nChars < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val out = new Array[Byte](16)
    val nHashes = nChars - k + 1
    val hs = new Array[Long](nHashes)
    val bytes = text.getBytes
    if (bytes.length == nChars) {
      // ASCII: char window i..i+k is exactly byte window i..i+k
      var i = 0
      while (i < nHashes) {
        md.reset()
        md.update(bytes, i, k)
        md.digest(out, 0, 16)
        hs(i) = ((out(0) & 0xffL) << 20) | ((out(1) & 0xffL) << 12) |
          ((out(2) & 0xffL) << 4) | ((out(3) & 0xffL) >>> 4)
        i += 1
      }
    } else {
      var i = 0
      while (i < nHashes) {
        val sub = text.substring(i, i + k).getBytes
        md.reset()
        md.update(sub)
        md.digest(out, 0, 16)
        hs(i) = ((out(0) & 0xffL) << 20) | ((out(1) & 0xffL) << 12) |
          ((out(2) & 0xffL) << 4) | ((out(3) & 0xffL) >>> 4)
        i += 1
      }
    }
    // monotonic-deque sliding minimum over windows of w hashes, minima
    // deduplicated in first-occurrence order (what array_distinct over
    // the window-min transform produced)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](nHashes)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    var j = 0
    while (j < nHashes) {
      while (tail > head && hs(deque(tail - 1)) >= hs(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) seen.add(hs(deque(head)))
      j += 1
    }
    val res = new Array[Any](seen.size)
    val it = seen.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next().longValue(); r += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
