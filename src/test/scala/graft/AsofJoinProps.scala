package graft

import graft.plans.GraftStrategies
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check of the custom as-of execs against a brute-force
  * per-row reference: on random datasets — duplicate keys, duplicate and
  * tied times, null times, keys on one side only, empty sides — both the
  * sort-merge and the broadcast variants must return, per left row, the
  * greatest right time <= the left time (null when none). The custom
  * physical operator is where interleaving bugs would hide (key-boundary
  * candidate reset, lookahead copy discipline, binary-search bounds);
  * random data covers interleavings the handwritten specs cannot.
  */
object AsofJoinProps extends Properties("AsofJoin") {

  // Spark jobs per trial are the cost driver — a few trials on varied
  // shapes beat ScalaCheck's default 100 tiny ones
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftStrategies.register(s)
    graft.functions.VecFunctions.register(s)
    s
  }

  private val keyGen = Gen.chooseNum(0L, 6L) // few keys -> dense collisions
  private val timeGen = Gen.option(Gen.chooseNum(0L, 40L)) // dup/tie-rich

  private val datasets: Gen[(List[(Long, Option[Long])], List[(Long, Option[Long])])] =
    for {
      nl <- Gen.chooseNum(0, 40)
      nr <- Gen.chooseNum(0, 40)
      l <- Gen.listOfN(nl, Gen.zip(keyGen, timeGen))
      r <- Gen.listOfN(nr, Gen.zip(keyGen, timeGen))
    } yield (l, r)

  private def reference(left: List[(Long, Option[Long])],
      right: List[(Long, Option[Long])]): List[((Long, Option[Long]), Option[Long])] =
    left.map { case (k, t) =>
      val m = t.flatMap { lt =>
        right.collect { case (`k`, Some(rt)) if rt <= lt => rt }
          .maxOption
      }
      ((k, t), m)
    }

  private def viaSpark(left: List[(Long, Option[Long])],
      right: List[(Long, Option[Long])], useBroadcast: Boolean)
      : List[((Long, Option[Long]), Option[Long])] = {
    val s = spark
    import s.implicits._
    // ids make left rows distinguishable through the join
    val l = left.zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t.map(Long.box).orNull) }
      .toDF("id", "k", "t")
    val r0 = right.map { case (k, t) => (k, t.map(Long.box).orNull) }
      .toDF("rk", "rt")
    val r = if (useBroadcast) broadcast(r0) else r0
    l.join(r, expr("k = rk AND asof_le(t, rt)"), "left")
      .select($"id", $"k", $"t", $"rt")
      .collect()
      .sortBy(_.getAs[Long]("id"))
      .map { row =>
        val t = if (row.isNullAt(2)) None else Some(row.getLong(2))
        val m = if (row.isNullAt(3)) None else Some(row.getLong(3))
        ((row.getLong(1), t), m)
      }.toList
  }

  property("sort-merge exec matches brute force on random interleavings") =
    Prop.forAll(datasets) { case (l, r) =>
      viaSpark(l, r, useBroadcast = false) == reference(l, r)
    }

  property("broadcast exec matches brute force on random interleavings") =
    Prop.forAll(datasets) { case (l, r) =>
      viaSpark(l, r, useBroadcast = true) == reference(l, r)
    }
}
