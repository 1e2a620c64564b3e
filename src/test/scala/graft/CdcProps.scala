package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property check of the generic CDC ordered-log apply
  * (`Relational.applyChangeLog`) against a sequential in-memory fold: on
  * random snapshots and random change logs — multiple changes per key,
  * out-of-order ops, D-then-U resurrections, inserts over absent keys,
  * deletes of absent keys, and DUPLICATE sequence numbers (the documented
  * lexicographic tie rule) — the merged output must equal taking each
  * key's greatest `(seq, op, payload)` tuple and applying it once, with
  * provenance decided by snapshot presence. CDC merge logic had a real
  * multi-change bug caught by review in round 7; this pins the operator
  * against the interleavings handwritten fixtures undersample.
  */
object CdcProps extends Properties("ApplyChangeLog") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestSession.spark

  // few keys -> dense collisions between snapshot and log
  private val keyGen = Gen.chooseNum(0L, 6L)
  private val valGen = Gen.chooseNum(-50L, 50L)
  private val opGen = Gen.oneOf("I", "U", "D")
  private val seqGen = Gen.chooseNum(1L, 6L) // small range -> duplicate seqs

  private val scenarios: Gen[(Map[Long, Long], List[(Long, Long, String, Long)])] =
    for {
      ns <- Gen.chooseNum(0, 12)
      snap <- Gen.listOfN(ns, Gen.zip(keyGen, valGen)).map(_.toMap)
      nl <- Gen.chooseNum(0, 25)
      log <- Gen.listOfN(nl, Gen.zip(Gen.zip(keyGen, seqGen), Gen.zip(opGen, valGen)))
    } yield (snap, log.map { case ((k, sq), (o, v)) => (k, sq, o, v) })

  property("merged snapshot equals the last-change fold, provenance included") =
    Prop.forAll(scenarios) { case (snap, log) =>
      val s = spark
      import s.implicits._
      val snapDf = snap.toSeq.toDF("k", "v")
      val logDf = log.toDF("k", "seq", "op", "v")
      val got = operators.Relational
        .applyChangeLog(snapDf, logDf, "k", "seq", "op")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      // reference: per key, the greatest (seq, op, payload) tuple wins —
      // the operator's documented duplicate-seq rule (ASCII op compare
      // matches Spark's UTF8 binary ordering); D drops, else upsert with
      // presence-based provenance
      val winners = log.groupBy(_._1).map { case (k, cs) =>
        k -> cs.map(c => (c._2, c._3, c._4)).max
      }
      val want: Set[(Long, Long, String)] =
        (snap.keySet -- winners.keySet)
          .map(k => (k, snap(k), "kept")) ++
          winners.collect { case (k, (_, op, v)) if op != "D" =>
            (k, v, if (snap.contains(k)) "updated" else "inserted")
          }
      Prop(got == want) :| s"got ${got.toList.sorted} want ${want.toList.sorted}"
    }
}
