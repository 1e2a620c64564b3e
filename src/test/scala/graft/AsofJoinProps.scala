package graft

import graft.plans.GraftStrategies
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check of the custom as-of execs against a brute-force
  * per-row reference: on random datasets — duplicate keys, duplicate and
  * tied times, null times, NULL KEYS (SQL `=` matches nothing on null, so
  * a null-keyed left row must get the outer null match and a null-keyed
  * right row must join nothing — the natural row ordering's null == null
  * would silently say otherwise), keys on one side only, empty sides —
  * both the sort-merge and the broadcast variants must return, per left
  * row, the greatest right time <= the left time (null when none). The
  * custom physical operator is where interleaving bugs would hide
  * (key-boundary candidate reset, lookahead copy discipline,
  * binary-search bounds); random data covers interleavings the
  * handwritten specs cannot.
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

  // few keys -> dense collisions; 1-in-6 null keys exercise the
  // SQL-equality-never-matches-null paths on both sides
  private val keyGen: Gen[Option[Long]] =
    Gen.frequency(5 -> Gen.chooseNum(0L, 6L).map(Some(_)), 1 -> Gen.const(None))
  private val timeGen = Gen.option(Gen.chooseNum(0L, 40L)) // dup/tie-rich

  private type Rows = List[(Option[Long], Option[Long])]

  private val datasets: Gen[(Rows, Rows)] =
    for {
      nl <- Gen.chooseNum(0, 40)
      nr <- Gen.chooseNum(0, 40)
      l <- Gen.listOfN(nl, Gen.zip(keyGen, timeGen))
      r <- Gen.listOfN(nr, Gen.zip(keyGen, timeGen))
    } yield (l, r)

  private def reference(left: Rows, right: Rows)
      : List[((Option[Long], Option[Long]), Option[Long])] =
    left.map { case (k, t) =>
      // SQL semantics: a match needs non-null equal keys AND rt <= lt
      val m = for {
        key <- k
        lt <- t
        best <- right.collect {
          case (Some(`key`), Some(rt)) if rt <= lt => rt
        }.maxOption
      } yield best
      ((k, t), m)
    }

  /** Shared harness for every property: builds the `(id, k, t)` /
    * `(rk, rt)` frames from a dataset pair (ids make left rows
    * distinguishable through the join), runs `op` on them, and decodes
    * the result back into the reference's row shape.
    */
  private def runOperator(left: Rows, right: Rows)(
      op: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)
        => org.apache.spark.sql.DataFrame)
      : List[((Option[Long], Option[Long]), Option[Long])] = {
    val s = spark
    import s.implicits._
    val ldf = left.zipWithIndex
      .map { case ((k, t), i) =>
        (i.toLong, k.map(Long.box).orNull, t.map(Long.box).orNull) }
      .toDF("id", "k", "t")
    val rdf = right
      .map { case (k, t) => (k.map(Long.box).orNull, t.map(Long.box).orNull) }
      .toDF("rk", "rt")
    op(ldf, rdf)
      .select($"id", $"k", $"t", $"rt")
      .collect()
      .sortBy(_.getAs[Long]("id"))
      .map { row =>
        val k = if (row.isNullAt(1)) None else Some(row.getLong(1))
        val t = if (row.isNullAt(2)) None else Some(row.getLong(2))
        val m = if (row.isNullAt(3)) None else Some(row.getLong(3))
        ((k, t), m)
      }.toList
  }

  private def viaSpark(left: Rows, right: Rows, useBroadcast: Boolean)
      : List[((Option[Long], Option[Long]), Option[Long])] =
    runOperator(left, right) { (l, r0) =>
      val r = if (useBroadcast) broadcast(r0) else r0
      l.join(r, expr("k = rk AND asof_le(t, rt)"), "left")
    }

  property("sort-merge exec matches brute force on random interleavings") =
    Prop.forAll(datasets) { case (l, r) =>
      viaSpark(l, r, useBroadcast = false) == reference(l, r)
    }

  property("broadcast exec matches brute force on random interleavings") =
    Prop.forAll(datasets) { case (l, r) =>
      viaSpark(l, r, useBroadcast = true) == reference(l, r)
    }

  /** The salted pre-pass must be value-invisible: on random data with a
    * threshold low enough that several keys take the hot branch (and with
    * null keys/times flowing through the salt hash and the replication
    * explode), `asofSaltedLe` must equal the same brute-force reference —
    * multiplicity included (the hot-side replication must never fan out a
    * left row, and a null-keyed left row still gets exactly one outer
    * null match).
    */
  property("salted pre-pass matches brute force under random skew") =
    Prop.forAll(datasets) { case (l, r) =>
      runOperator(l, r)(operators.TemporalJoins.asofSaltedLe(
        _, _, Seq("k"), Seq("rk"), "t", "rt",
        buckets = 3, hotThreshold = 5L)) == reference(l, r)
    }

  /** Same invisibility contract for the time-sliced variant: with random
    * small slice widths over the 0–40 time range, most matches cross a
    * bucket boundary and ride the carry-in row — the path handwritten
    * fixtures undersample. Null keys and times bucket to null and must
    * take the outer-null path.
    */
  property("sliced pre-pass matches brute force across bucket boundaries") =
    Prop.forAll(datasets, Gen.chooseNum(1L, 15L)) { case ((l, r), width) =>
      runOperator(l, r)(operators.TemporalJoins.asofSlicedLe(
        _, _, Seq("k"), Seq("rk"), "t", "rt", width)) == reference(l, r)
    }

  /** The staleness bound is exactly brute-force-with-a-filter: the latest
    * prior is also the closest, so the post-projection in
    * `asofToleranceLe` must equal filtering the reference match by
    * `lt - rt <= tol`. Random small tolerances over the 0–40 time range
    * hit both branches (kept and nulled) and the tol = 0 exact-tie edge.
    */
  private def toleranceReference(l: Rows, r: Rows, tol: Long)
      : List[((Option[Long], Option[Long]), Option[Long])] =
    reference(l, r).map { case ((k, t), m) =>
      ((k, t), m.filter(rt => t.exists(lt => lt - rt <= tol)))
    }

  property("tolerance bound equals brute force with a staleness filter") =
    Prop.forAll(datasets, Gen.chooseNum(0L, 40L)) { case ((l, r), tol) =>
      runOperator(l, r)(operators.TemporalJoins.asofToleranceLe(
        _, _, Seq("k"), Seq("rk"), "t", "rt", tol)) ==
        toleranceReference(l, r, tol)
    }

  /** The full pandas `merge_asof(direction, tolerance)` matrix: the
    * generic [[withMatchBound]] projection must equal filtering each
    * direction's brute-force match by its distance — forward bounds
    * `rt − lt`, nearest bounds `|rt − lt|`. Exact for the same reason in
    * every direction: the returned match is the CLOSEST qualifying row,
    * so if it violates the bound all others do too.
    */
  property("tolerance composes with the forward and nearest directions") =
    Prop.forAll(datasets, Gen.chooseNum(0L, 40L)) { case ((l, r), tol) =>
      import org.apache.spark.sql.functions.{abs => sqlAbs, col, lit}
      val fwd = runOperator(l, r) { (ldf, rdf) =>
        operators.TemporalJoins.withMatchBound(
          operators.TemporalJoins.asofForwardGe(ldf, rdf, Seq("k"), Seq("rk"),
            "t", "rt"),
          Seq("rk", "rt"),
          col("rt").isNotNull && col("rt") - col("t") <= lit(tol))
      }
      val fwdWant = referenceForward(l, r).map { case ((k, t), m) =>
        ((k, t), m.filter(rt => t.exists(lt => rt - lt <= tol)))
      }
      val near = runOperator(l, r) { (ldf, rdf) =>
        operators.TemporalJoins.withMatchBound(
          operators.TemporalJoins.asofNearest(ldf, rdf, Seq("k"), Seq("rk"),
            "t", "rt"),
          Seq("rk", "rt"),
          col("rt").isNotNull && sqlAbs(col("rt") - col("t")) <= lit(tol))
      }
      val nearWant = nearestReference(l, r).map { case ((k, t), m) =>
        ((k, t), m.filter(rt => t.exists(lt => math.abs(rt - lt) <= tol)))
      }
      val fwdOk = Prop(fwd == fwdWant) :| s"forward: $fwd vs $fwdWant"
      val nearOk = Prop(near == nearWant) :| s"nearest: $near vs $nearWant"
      fwdOk && nearOk
    }

  /** The scaladoc claim that the staleness bound composes with the skew
    * guards, exercised: `withStalenessBound` over the salted AND the
    * sliced pre-passes must both equal the same filtered reference the
    * bare tolerance join satisfies.
    */
  property("staleness bound composes with the salted and sliced skew guards") =
    Prop.forAll(datasets, Gen.chooseNum(0L, 40L)) { case ((l, r), tol) =>
      val want = toleranceReference(l, r, tol)
      val viaSalted = runOperator(l, r) { (ldf, rdf) =>
        operators.TemporalJoins.withStalenessBound(
          operators.TemporalJoins.asofSaltedLe(ldf, rdf, Seq("k"), Seq("rk"),
            "t", "rt", buckets = 3, hotThreshold = 5L),
          Seq("rk", "rt"), "t", "rt", tol)
      }
      val viaSliced = runOperator(l, r) { (ldf, rdf) =>
        operators.TemporalJoins.withStalenessBound(
          operators.TemporalJoins.asofSlicedLe(ldf, rdf, Seq("k"), Seq("rk"),
            "t", "rt", sliceWidth = 5L),
          Seq("rk", "rt"), "t", "rt", tol)
      }
      viaSalted == want && viaSliced == want
    }

  /** Forward direction: the negation routing must return, per left row,
    * the SMALLEST right time >= the left time — the exact mirror of
    * `reference`, under the same null-key/null-time/tie/empty-side
    * generator coverage.
    */
  private def referenceForward(left: Rows, right: Rows)
      : List[((Option[Long], Option[Long]), Option[Long])] =
    left.map { case (k, t) =>
      val m = for {
        key <- k
        lt <- t
        best <- right.collect {
          case (Some(`key`), Some(rt)) if rt >= lt => rt
        }.minOption
      } yield best
      ((k, t), m)
    }

  property("forward negation routing matches brute-force earliest-next") =
    Prop.forAll(datasets) { case (l, r) =>
      runOperator(l, r)(operators.TemporalJoins.asofForwardGe(
        _, _, Seq("k"), Seq("rk"), "t", "rt")) == referenceForward(l, r)
    }

  /** Nearest: the two-pass pipeline must pick whichever of the
    * latest-prior / earliest-next candidates is closer, prior on ties —
    * brute-force over both direction references. The 0–40 time range is
    * dense enough that ties (equidistant prior and next) occur.
    */
  private def nearestReference(l: Rows, r: Rows)
      : List[((Option[Long], Option[Long]), Option[Long])] = {
    val prior = reference(l, r).map(_._2)
    val next = referenceForward(l, r).map(_._2)
    l.zip(prior.zip(next)).map { case ((k, t), (pb, nf)) =>
      val m = (pb, nf) match {
        case (Some(p), Some(n)) =>
          val lt = t.get // both sides matched => lt is defined
          if (lt - p <= n - lt) Some(p) else Some(n)
        case (p, n) => p.orElse(n)
      }
      ((k, t), m)
    }
  }

  property("nearest two-pass pipeline matches brute force, prior wins ties") =
    Prop.forAll(datasets) { case (l, r) =>
      runOperator(l, r)(operators.TemporalJoins.asofNearest(
        _, _, Seq("k"), Seq("rk"), "t", "rt")) == nearestReference(l, r)
    }

  /** The full direction × skew-guard matrix: the engines below are
    * value-invisible backward as-of implementations, so routing a
    * DIRECTION through any of them must not change a single row. The
    * guards run on scratch data the directions manufacture (negated
    * times; renamed right columns in nearest's two passes), which the
    * direction-only and guard-only properties above never exercise —
    * salting hashes `-t`, slicing buckets negative times and must carry
    * across boundaries of the negated axis. Thresholds/widths are small
    * enough that several keys go hot and most matches cross a slice on
    * the 0–40 fixture range.
    */
  private val engines: List[(String, operators.TemporalJoins.AsofLeEngine)] =
    List(
      "salted" -> (operators.TemporalJoins.asofSaltedLe(
        _, _, _, _, _, _, buckets = 3, hotThreshold = 5L)),
      "saltedAuto" -> (operators.TemporalJoins.asofSaltedAutoLe(
        _, _, _, _, _, _, skewRatio = 1.5, maxFactor = 4)),
      "sliced" -> (operators.TemporalJoins.asofSlicedLe(
        _, _, _, _, _, _, sliceWidth = 5L)))

  property("forward direction composes with every skew-guard engine") =
    Prop.forAll(datasets) { case (l, r) =>
      val want = referenceForward(l, r)
      Prop.all(engines.map { case (name, eng) =>
        val got = runOperator(l, r)(operators.TemporalJoins.asofForwardGe(
          _, _, Seq("k"), Seq("rk"), "t", "rt", engine = eng))
        Prop(got == want) :| s"forward x $name"
      }: _*)
    }

  property("nearest direction composes with every skew-guard engine") =
    Prop.forAll(datasets) { case (l, r) =>
      val want = nearestReference(l, r)
      Prop.all(engines.map { case (name, eng) =>
        val got = runOperator(l, r)(operators.TemporalJoins.asofNearest(
          _, _, Seq("k"), Seq("rk"), "t", "rt", engine = eng))
        Prop(got == want) :| s"nearest x $name"
      }: _*)
    }
}
