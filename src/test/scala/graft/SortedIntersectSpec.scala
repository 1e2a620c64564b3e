package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native merge-count expression behind the jaccard verify stage
  * (r17): on sorted, distinct long arrays it must be value-identical to
  * `size(array_intersect(a, b))` — including empty arrays and NULL
  * inputs — because the operator swapped one for the other with the
  * oracle unchanged. Checked through the SQL engine (codegen path) on a
  * randomized frame, and through a one-row eval (interpreted path). */
class SortedIntersectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def interCountCol(a: String, b: String) = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(graft.functions.SortedLongIntersectCount(
      expression(col(a)), expression(col(b))))
  }

  test("merge count == size(array_intersect) on sorted distinct long arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 400).map { i =>
      def arr() = {
        val n = rnd.nextInt(30)
        // small value domain forces frequent overlaps and shared runs
        Seq.fill(n)(rnd.nextInt(40).toLong).distinct.sorted
      }
      (i.toLong, arr(), arr())
    } :+ ((400L, Seq.empty[Long], Seq(1L, 2L))) :+
      ((401L, Seq.empty[Long], Seq.empty[Long]))
    val df = rows.toDF("id", "ga", "gb")
    val bad = df.select(col("id"),
        interCountCol("ga", "gb").as("fast"),
        size(array_intersect(col("ga"), col("gb"))).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.count() === 0)
  }

  test("NULL input yields NULL, matching size(array_intersect) semantics") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]))
      .toDF("ga", "gb")
    val r = df.select(interCountCol("ga", "gb").as("fast")).collect()(0)
    assert(r.isNullAt(0))
  }
}
