package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check of the stream-stream as-of join against its batch
  * contract: on random keyed datasets replayed IN EVENT ORDER across a
  * random number of micro-batches, the completed stream's output must be
  * row-identical to `asofToleranceLe(maxStaleness = horizon)` over the
  * same inputs — the design theorem (`streaming/Streams.scala`,
  * `streamAsofJoin` scaladoc) as an executable statement. Random data
  * covers what the fixture replay cannot: probe/right ties in the same
  * second split across micro-batches (the watermark-delay path), multiple
  * probes per key per second, keys present on one side only, empty
  * sides, and horizon boundaries landing exactly on a gap. Null
  * keys/times are out of the streaming operator's typed domain
  * (`Dataset[(Long, String, Long, Long)]`) — the batch variants own that
  * surface, pinned in `AsofJoinProps`.
  */
object StreamAsofProps extends Properties("StreamAsofJoin") {

  // each trial spins a streaming query on a RocksDB session — a few
  // varied trials beat ScalaCheck's default 100
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private lazy val spark = {
    val s = SparkTestSession.rocksDbSession("graft-stream-asof-props")
    graft.plans.GraftStrategies.register(s)
    graft.functions.VecFunctions.register(s)
    s
  }

  // dense key/time collisions; times well away from Long extremes
  private val keyGen = Gen.chooseNum(0L, 4L)
  private val timeGen = Gen.chooseNum(1704100000L, 1704100040L)

  private case class Trial(
      probes: List[(Long, Long)], // (key, t) — event_id assigned by index
      rights: List[(Long, Long)], // (key, t)
      horizon: Long,
      nChunks: Int)

  private val trials: Gen[Trial] =
    for {
      np <- Gen.chooseNum(0, 25)
      nr <- Gen.chooseNum(0, 25)
      ps <- Gen.listOfN(np, Gen.zip(keyGen, timeGen))
      rs <- Gen.listOfN(nr, Gen.zip(keyGen, timeGen))
      hz <- Gen.chooseNum(0L, 45L)
      nc <- Gen.chooseNum(1, 5)
    } yield Trial(ps, rs, hz, nc)

  property("completed in-order replay equals the batch tolerance join") =
    Prop.forAll(trials) { trial =>
      val s = spark
      import s.implicits._
      implicit val ctx = s.sqlContext

      val tagged =
        trial.probes.zipWithIndex.map { case ((k, t), i) =>
          (k, "L", i.toLong, t)
        } ++ trial.rights.map { case (k, t) => (k, "R", 0L, t) }
      val ordered = tagged.sortBy(_._4)
      val chunkSize = math.max(1, (ordered.length + trial.nChunks - 1) /
        trial.nChunks)
      val in = MemoryStream[(Long, String, Long, Long)]
      val name = s"stream_asof_prop_${System.identityHashCode(in)}"
      val q = Streams.streamAsofJoin(in.toDS(), trial.horizon)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val got =
        try {
          ordered.grouped(chunkSize).foreach { c =>
            in.addData(c); q.processAllAvailable()
          }
          // watermark flush: a right row for an unused key far past every
          // probe finalizes all pending answers
          in.addData((-99L, "R", 0L, 1704100040L + 3600L))
          q.processAllAvailable()
          s.table(name).as[Streams.AsofEnriched].collect()
            .map(e => (e.event_id, e.user_id, e.last_signup_s)).toSet
        } finally q.stop()

      val want = trial.probes.zipWithIndex.map { case ((k, lt), i) =>
        val m = trial.rights.collect {
          case (`k`, rt) if rt <= lt && lt - rt <= trial.horizon => rt
        }.maxOption
        (i.toLong, k, m)
      }.toSet

      Prop(got == want) :| s"got ${got.toList.sorted}, want ${want.toList.sorted}"
    }
}
