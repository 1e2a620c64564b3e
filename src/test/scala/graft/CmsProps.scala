package graft

import graft.functions.CountMinAggregator
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the count-min sketch — pure-JVM invariants
  * (no SparkSession): estimates never undercount, the grid total tracks
  * the insert count, and any split-and-merge plan yields the identical
  * grid a single pass would build (merge is exact, which is what makes
  * the map-side partial aggregation safe). The cross-engine bucket
  * agreement is proven at query level: `cms_user_counts`' DuckDB oracle
  * rebuilds the grid in SQL and hash-compares the estimates.
  */
object CmsProps extends Properties("CountMin") {

  private val depth = 3
  private val width = 16 // small grid so collisions are common under test
  private def agg = new CountMinAggregator(depth, width)

  private val items: Gen[List[String]] =
    Gen.chooseNum(20, 800).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        4 -> Gen.const("hot"),
        6 -> Gen.chooseNum(1, 60).map(i => s"t$i"))))

  property("estimates never undercount; total tracks inserts") =
    Prop.forAll(items) { vs =>
      val a = agg
      val sk = a.finish(vs.foldLeft(a.zero)(a.reduce))
      val truth = vs.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
      sk.total == vs.size &&
        truth.forall { case (k, c) => sk.estimate(k) >= c } &&
        // a never-seen item can only hit counters other rows filled
        sk.estimate("never-inserted-item") <= vs.size
    }

  property("any split-and-merge plan builds the identical grid") =
    Prop.forAll(items, Gen.chooseNum(1, 7)) { (vs, parts) =>
      val whole = agg
      val one = whole.finish(vs.foldLeft(whole.zero)(whole.reduce))
      val chunkSize = math.max(1, vs.size / parts)
      val m = agg
      val merged = m.finish(
        vs.grouped(chunkSize)
          .map(chunk => chunk.foldLeft(m.zero)(m.reduce))
          .reduce(m.merge))
      merged.total == one.total && merged.table == one.table
    }
}
