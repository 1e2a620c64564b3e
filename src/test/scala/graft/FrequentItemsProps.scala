package graft

import graft.functions.FrequentItemsAggregator
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the Misra–Gries heavy-hitters sketch —
  * pure-JVM invariants (no SparkSession): the summary stays bounded, the
  * classic MG bracket `true - dec <= est <= true` holds for every retained
  * item under arbitrary split-and-merge plans, and any item more frequent
  * than n/(capacity+1) is guaranteed to survive.
  */
object FrequentItemsProps extends Properties("FrequentItems") {

  private val capacity = 8
  private val agg = new FrequentItemsAggregator(capacity)

  // skewed universe: a few hot items over a long tail, so both the exact
  // and the lossy regime are exercised depending on the draw
  private val items: Gen[List[String]] =
    Gen.chooseNum(50, 1500).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const("hot1"), 3 -> Gen.const("hot2"),
        4 -> Gen.chooseNum(1, 30).map(i => s"t$i"))))

  private def summaryOf(vs: Seq[String]) = vs.foldLeft(agg.zero)(agg.reduce)

  property("summary never exceeds capacity, dec never negative") =
    Prop.forAll(items, Gen.chooseNum(1, 8)) { (vs, parts) =>
      val chunkSize = math.max(1, vs.size / parts)
      val merged = vs.grouped(chunkSize).map(summaryOf).reduce(agg.merge)
      merged.counts.size <= capacity && merged.dec >= 0 &&
        merged.counts.valuesIterator.forall(_ > 0)
    }

  property("est <= true <= est + dec for every retained item, any merge plan") =
    Prop.forAll(items, Gen.chooseNum(1, 8)) { (vs, parts) =>
      val truth = vs.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
      val chunkSize = math.max(1, vs.size / parts)
      val merged = vs.grouped(chunkSize).map(summaryOf).reduce(agg.merge)
      agg.finish(merged).forall { f =>
        f.est_count <= truth(f.item) &&
          truth(f.item) <= f.est_count + f.err_bound
      }
    }

  property("items above n/(capacity+1) frequency are always retained") =
    Prop.forAll(items, Gen.chooseNum(1, 8)) { (vs, parts) =>
      val truth = vs.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
      val chunkSize = math.max(1, vs.size / parts)
      val merged = vs.grouped(chunkSize).map(summaryOf).reduce(agg.merge)
      val retained = merged.counts.keySet
      truth.collect {
        case (k, c) if c > vs.size.toLong / (capacity + 1) => k
      }.forall(retained.contains)
    }
}
