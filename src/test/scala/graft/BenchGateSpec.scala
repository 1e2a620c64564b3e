package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate is load-bearing — it replaced judge-side
  * re-measures as the mechanism that adjudicates per-query drift — so its
  * adversarial properties get pinned here rather than re-argued from the
  * artifact each round (ADVICE r11: an engine-wide slowdown used to
  * divide itself out through the probe; round 13: a TRANSIENT load spike
  * used to evade the before/after-min correction entirely; round 14: a
  * second, shuffle-bound probe joins the scan-bound one, the probe
  * self-gate moves from all-samples-min to second-smallest, and masked
  * candidates surface as a soft-warning list).
  *
  * Gate inputs: per-pass warm times + interleaved probe samples per probe
  * (one more point than passes; point i and i+1 bracket pass i).
  */
class BenchGateSpec extends AnyFunSuite {
  // Bench.ProbeQueries are (q6_filter_agg, window_rank); use the real
  // names so the probe-special-casing under test is the production path
  private val probe = Bench.ProbeQueries.head
  private val probe2 = Bench.ProbeQueries(1)

  private def probes(samples: IndexedSeq[Double]) = Map(probe -> samples)
  private def quietProbes = probes(IndexedSeq(0.10, 0.10, 0.10, 0.10))

  test("quiet run, one real regression: flagged in every pass; others pass") {
    val floors = Map(probe -> 0.10, "a" -> 0.50, "b" -> 0.30)
    val p = Map(probe -> 0.10, "a" -> 2.00, "b" -> 0.35)
    val (scales, probeReg, regs, _) = Bench.gate(Seq(p, p, p), floors, quietProbes)
    assert(scales.forall(_ == 1.0) && !probeReg)
    assert(regs.size == 1 && regs.head.contains("\"query\":\"a\""))
  }

  test("uniform engine-wide slowdown cannot launder itself through the probe") {
    // everything (probe included) 4x slower in every pass: the cap keeps
    // the correction at 2.5 and the probe itself is judged uncorrected —
    // the run turns loudly red via probe_regression.
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val p = Map(probe -> 0.40, "a" -> 2.00)
    val (scales, probeReg, _, _) =
      Bench.gate(Seq(p, p, p), floors, probes(IndexedSeq.fill(4)(0.40)))
    assert(scales.forall(_ == 2.5), s"noise scale must cap at 2.5, got $scales")
    assert(probeReg, "a 4x probe drift must be a probe_regression verdict")
  }

  test("extreme uniform slowdown flags the non-probe queries too") {
    // 10x across the board in every pass: capped correction 2.5 leaves a
    // 4x adjusted ratio on 'a' -> flagged even before anyone reads
    // probe_regression
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val p = Map(probe -> 1.00, "a" -> 5.00)
    val (_, probeReg, regs, _) =
      Bench.gate(Seq(p, p, p), floors, probes(IndexedSeq.fill(4)(1.00)))
    assert(probeReg)
    assert(regs.exists(_.contains("\"query\":\"a\"")))
  }

  test("genuinely noisy host within the cap is corrected, not flagged") {
    // probe 2x over floor in every bracket (sustained contention),
    // queries 2.2x: adjusted to 1.1x -> quiet, exactly the r10-outlier
    // adjudication the gate automated
    val floors = Map(probe -> 0.10, "a" -> 0.50, "b" -> 0.30)
    val p = Map(probe -> 0.20, "a" -> 1.10, "b" -> 0.66)
    val (scales, probeReg, regs, _) =
      Bench.gate(Seq(p, p, p), floors, probes(IndexedSeq.fill(4)(0.20)))
    assert(scales.forall(_ == 2.0))
    assert(regs.isEmpty, s"corrected run must be quiet: $regs")
    assert(!probeReg, "2x is exactly the probe factor, not beyond it")
  }

  test("transient load (the r12 driver artifact) is adjudicated per pass") {
    // load strikes passes 1-2 (brackets read ~1.4x floor) then lifts; the
    // LAST probe sample is back under the floor. The old before/after-min
    // correction read 1.0 and flagged eight code-identical queries at
    // ~2.0-2.4x. Per-pass brackets correct passes 1-2 by 1.4 and the
    // noisy-but-corrected times clear the factor.
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val noisy = Map(probe -> 0.14, "a" -> 1.05) // 2.1x floor under load
    val (scales, probeReg, regs, _) = Bench.gate(
      Seq(noisy, noisy, noisy), floors,
      probes(IndexedSeq(0.14, 0.14, 0.14, 0.09)))
    assert(!probeReg)
    // pass 3's bracket min is the quiet 0.09 sample -> scale 1.0 there,
    // but passes 1-2 carry the 1.4 correction and their adjusted 1.5x min
    // clears the gate
    assert(scales.take(2).forall(s => math.abs(s - 1.4) < 1e-9), s"$scales")
    assert(regs.isEmpty, s"transient-noise run must be quiet: $regs")
  }

  test("in-suite pass variance (the r13 idle false flags) never carries the verdict") {
    // per-pass times on the full suite swing 2-3x with unchanged code
    // (AQE flips, allocation pressure): one fast pass + two slow ones.
    // The gated statistic is the min over corrected passes — the slow
    // passes cannot flag the query (a majority vote flagged 12
    // code-identical queries on an idle host before this was pinned).
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val fast = Map(probe -> 0.10, "a" -> 0.55)
    val slow = Map(probe -> 0.10, "a" -> 1.25)
    val (_, _, regs, _) = Bench.gate(Seq(slow, fast, slow), floors, quietProbes)
    assert(regs.isEmpty, s"one clean pass must clear the query: $regs")
  }

  test("a spiky-bracket discount is bounded by the cap (accepted residual)") {
    // a load blip that hits BOTH probe samples around one pass while the
    // pass itself stayed quiet grants that pass an undeserved discount —
    // bounded at NoiseScaleCap. A regression beyond cap x factor (here
    // 10x floor vs 2.5 cap x 2.5 factor = 6.25x) still cannot hide.
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val slow = Map(probe -> 0.10, "a" -> 5.00) // 10x its floor, every pass
    val (_, _, regs, _) = Bench.gate(
      Seq(slow, slow, slow), floors,
      probes(IndexedSeq(0.40, 0.40, 0.10, 0.10))) // pass 1 bracket spiked 4x
    assert(regs.size == 1 && regs.head.contains("\"query\":\"a\""))
  }

  test("floorless and failed queries are never flagged; no-floor probe disables correction") {
    val floors = Map("a" -> 0.50)
    val p = Map("new_query" -> 9.0, "failed_q" -> -1.0, "a" -> 0.40)
    val (scales, probeReg, regs, _) =
      Bench.gate(Seq(p, p, p), floors, probes(IndexedSeq.fill(4)(0.20)))
    assert(scales.forall(_ == 1.0) && !probeReg && regs.isEmpty)
  }

  test("invalid probe samples fall back to the valid bracket side, else no correction") {
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val p = Map(probe -> 0.10, "a" -> 0.40)
    val (scales, _, _, _) = Bench.gate(
      Seq(p, p, p), floors, probes(IndexedSeq(-1.0, 0.15, -1.0, -1.0)))
    assert(math.abs(scales(0) - 1.5) < 1e-9 && math.abs(scales(1) - 1.5) < 1e-9
      && scales(2) == 1.0, s"$scales")
  }

  // ---- round-14 additions: second probe, second-smallest self-gate,
  // ---- masked-candidate warnings, cold-band detector

  test("shuffle-bound drift is corrected by the shuffle probe the scan probe misses") {
    // the r13 calibration case: scan probe quiet (it is scan-bound),
    // window/shuffle-bound queries 2.2x over floor. The second probe —
    // itself shuffle-bound — reads the same 2.2x drift and corrects the
    // pass; with only the scan probe the query would flag at 2.2x
    // (the old factor sat at 3.5 only to absorb exactly this blindness —
    // the second probe is what let it tighten to 2.5).
    val floors = Map(probe -> 0.10, probe2 -> 0.20, "shuffly" -> 0.50)
    val p = Map(probe -> 0.10, probe2 -> 0.44, "shuffly" -> 1.10)
    val both = Map(
      probe -> IndexedSeq.fill(4)(0.10),
      probe2 -> IndexedSeq.fill(4)(0.44))
    val (scales, probeReg, regs, _) = Bench.gate(Seq(p, p, p), floors, both)
    assert(scales.forall(s => math.abs(s - 2.2) < 1e-9), s"$scales")
    assert(regs.isEmpty, s"shuffle-probe-corrected run must be quiet: $regs")
    // 2.2x on the probe itself is over the 2.0 self-gate: the sustained
    // shuffle drift is loudly visible as probe_regression, not silent
    assert(probeReg)
  }

  test("probe self-gate: one lucky dip no longer clears a sustained slowdown") {
    // ADVICE r13: with the min-of-all-samples rule, samples
    // (0.09, 0.25, 0.25, 0.25) on a 0.10 floor read clean (min under
    // 2x) while every pass collected corrections. Second-smallest (0.25)
    // convicts the sustained slowdown.
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val p = Map(probe -> 0.25, "a" -> 0.55)
    val (_, probeReg, _, _) = Bench.gate(
      Seq(p, p, p), floors, probes(IndexedSeq(0.09, 0.25, 0.25, 0.25)))
    assert(probeReg, "a single under-factor dip must not acquit the probe")
  }

  test("probe self-gate: one unlucky spike still cannot convict a healthy engine") {
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val p = Map(probe -> 0.10, "a" -> 0.55)
    val (_, probeReg, regs, _) = Bench.gate(
      Seq(p, p, p), floors, probes(IndexedSeq(0.10, 0.45, 0.10, 0.10)))
    assert(!probeReg, "second-smallest must shrug off one spiked sample")
    assert(regs.isEmpty)
  }

  test("corrections that mask an over-factor raw time surface as soft warnings") {
    // raw min 2.0s on a 0.50 floor = 4.0x (over the 2.5 factor); the
    // noisy brackets grant a 2.5-capped correction -> adjusted 1.6x,
    // green — but the query's name must appear in the warning list so
    // the discount is auditable instead of silent.
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val p = Map(probe -> 0.25, "a" -> 2.00)
    val (_, _, regs, warned) = Bench.gate(
      Seq(p, p, p), floors, probes(IndexedSeq.fill(4)(0.25)))
    assert(regs.isEmpty, s"corrected run must not hard-flag: $regs")
    assert(warned == Seq("a"), s"masked candidate must be warned: $warned")
  }

  test("cold-band detector replays the r13 morning band (positions 28-35)") {
    // 60 queries with committed cold floors of 1s each; the morning band:
    // positions 28-35 cold at 5x their own floors, neighbors at ~1.2x.
    // 8 consecutive positions over the 3x-floor threshold must come back,
    // nothing else.
    val names = (0 until 60).map(i => f"q$i%02d")
    val coldFloors = names.map(_ -> 1.0).toMap
    val cold = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i >= 28 && i <= 35) 5.0 else 1.2)
    }
    val band = Bench.coldBand(cold, coldFloors)
    assert(band == (28 to 35).map(i => f"q$i%02d"),
      s"expected exactly the planted band, got $band")
  }

  test("cold-band detector: always-expensive colds, isolated spikes, floorless stay unflagged") {
    val names = (0 until 40).map(i => f"q$i%02d")
    val coldFloors = names.zipWithIndex.map { case (n, i) =>
      // queries 10-12 have EXPENSIVE cold floors (heavy codegen / index
      // builds every run) — the false-flag case the run-median detector
      // hit on its first healthy run: high cold, but high floor too
      n -> (if (i >= 10 && i <= 12) 5.0 else 1.0)
    }.toMap
    val normal = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i >= 10 && i <= 12) 5.5 else 1.2)
    }
    assert(Bench.coldBand(normal, coldFloors).isEmpty,
      "always-expensive colds at ~their own floors are not a band")
    // one isolated 10x spike (run of 1) + a pair (run of 2): below the
    // 3-run minimum, not a band
    val spiky = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i == 7 || i == 20 || i == 21) 10.0 else 1.0)
    }
    assert(Bench.coldBand(spiky, coldFloors).isEmpty)
    // floorless queries are neutral AND break a would-be band: 28-35 all
    // spiked but 31 has no floor -> two runs of 3 and 4 remain, both >= 3
    val gapped = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i >= 28 && i <= 35) 9.0 else 1.0)
    }
    val gappedFloors = coldFloors - "q31"
    val got = Bench.coldBand(gapped, gappedFloors)
    assert(got == (28 to 35).filter(_ != 31).map(i => f"q$i%02d"),
      s"floorless member must break but not erase the band: $got")
  }
}
