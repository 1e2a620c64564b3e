package graft.plans

import graft.functions.{FloatVecDot, FloatVecNorm, SimHashBits, WordShingles}
import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extension registering graft's native Catalyst expressions as SQL
  * functions, so a deployment can enable the whole library with
  * `spark.sql.extensions=graft.plans.GraftExtensions` and write
  * `SELECT vec_dot(a.embedding, b.embedding)` from plain SQL — plus the
  * [[VecFusionRule]] optimizer rule that rewrites hand-written
  * `aggregate(zip_with(...))` dot products onto the native fast path.
  *
  * Planner customization is deliberately minimal: SURVEY.md §4's audit
  * found every REFERENCE operator maps to Catalyst built-ins, so the only
  * whole-operator extension is [[AsofJoinStrategy]] → [[AsofJoinExec]] for
  * the as-of join (an operator Spark lacks natively; see `AsofJoin.scala`
  * for why the native merge beats the union+window composition), plus
  * function injection and the [[VecFusionRule]] optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VecFusionRule)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("asof_le"),
      new ExpressionInfo(classOf[AsofLE].getName, "asof_le"),
      (es: Seq[Expression]) => AsofLE(es.head, es(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => FloatVecDot(es.head, es(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVecNorm].getName, "vec_norm"),
      (es: Seq[Expression]) => FloatVecNorm(es.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHashBits].getName, "simhash"),
      (es: Seq[Expression]) => es match {
        case Seq(arr) => SimHashBits(arr, 28)
        case Seq(arr, Literal(bits: Int, _)) if bits >= 1 && bits <= 28 =>
          SimHashBits(arr, bits)
        case Seq(arr, Literal(bits: Long, _)) if bits >= 1 && bits <= 28 =>
          SimHashBits(arr, bits.toInt)
        // Anything else (column expression, non-integer literal, literal
        // outside [1,28], wrong arity) is a hard analysis error — never a
        // silent default and never the case-class require's raw
        // IllegalArgumentException.
        case other => throw new AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" ->
            ("simhash expects (array<string>) or (array<string>, INT literal in [1,28]); " +
              s"got ${other.size} argument(s): ${other.map(_.sql).mkString(", ")}")))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (es: Seq[Expression]) => es match {
        case Seq(arr, Literal(n: Int, _)) if n >= 1 => WordShingles(arr, n)
        // bound BEFORE toInt: an unchecked narrowing would silently wrap
        // (4294967297 -> 1) or trip the case-class require
        case Seq(arr, Literal(n: Long, _)) if n >= 1 && n <= Int.MaxValue =>
          WordShingles(arr, n.toInt)
        case other => throw new AnalysisException(
          "USER_RAISED_EXCEPTION",
          Map("errorMessage" ->
            ("word_shingles expects (array<string>, positive INT literal); " +
              s"got ${other.size} argument(s): ${other.map(_.sql).mkString(", ")}")))
      }))
  }
}
