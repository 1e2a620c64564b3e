package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate is load-bearing — it replaced judge-side
  * re-measures as the mechanism that adjudicates per-query drift — so its
  * adversarial properties get pinned here rather than re-argued from the
  * artifact each round (ADVICE r11: an engine-wide slowdown used to
  * divide itself out through the probe; round 13: a TRANSIENT load spike
  * used to evade the before/after-min correction entirely).
  *
  * Gate inputs: per-pass warm times + interleaved probe samples (one more
  * sample than passes; sample i and i+1 bracket pass i).
  */
class BenchGateSpec extends AnyFunSuite {
  // Bench.ProbeQuery is q6_filter_agg; use the real name so the
  // probe-special-casing under test is the production path
  private val probe = "q6_filter_agg"

  private def quietProbes = IndexedSeq(0.10, 0.10, 0.10, 0.10)

  test("quiet run, one real regression: flagged in every pass; others pass") {
    val floors = Map(probe -> 0.10, "a" -> 0.50, "b" -> 0.30)
    val p = Map(probe -> 0.10, "a" -> 2.00, "b" -> 0.35)
    val (scales, probeReg, regs) = Bench.gate(Seq(p, p, p), floors, quietProbes)
    assert(scales.forall(_ == 1.0) && !probeReg)
    assert(regs.size == 1 && regs.head.contains("\"query\":\"a\""))
  }

  test("uniform engine-wide slowdown cannot launder itself through the probe") {
    // everything (probe included) 4x slower in every pass: the cap keeps
    // the correction at 2.5 and the probe itself is judged uncorrected —
    // the run turns loudly red via probe_regression.
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val p = Map(probe -> 0.40, "a" -> 2.00)
    val (scales, probeReg, _) =
      Bench.gate(Seq(p, p, p), floors, IndexedSeq.fill(4)(0.40))
    assert(scales.forall(_ == 2.5), s"noise scale must cap at 2.5, got $scales")
    assert(probeReg, "a 4x probe drift must be a probe_regression verdict")
  }

  test("extreme uniform slowdown flags the non-probe queries too") {
    // 10x across the board in every pass: capped correction 2.5 leaves a
    // 4x adjusted ratio on 'a' -> flagged even before anyone reads
    // probe_regression
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val p = Map(probe -> 1.00, "a" -> 5.00)
    val (_, probeReg, regs) =
      Bench.gate(Seq(p, p, p), floors, IndexedSeq.fill(4)(1.00))
    assert(probeReg)
    assert(regs.exists(_.contains("\"query\":\"a\"")))
  }

  test("genuinely noisy host within the cap is corrected, not flagged") {
    // probe 2x over floor in every bracket (sustained contention),
    // queries 2.2x: adjusted to 1.1x -> quiet, exactly the r10-outlier
    // adjudication the gate automated
    val floors = Map(probe -> 0.10, "a" -> 0.50, "b" -> 0.30)
    val p = Map(probe -> 0.20, "a" -> 1.10, "b" -> 0.66)
    val (scales, probeReg, regs) =
      Bench.gate(Seq(p, p, p), floors, IndexedSeq.fill(4)(0.20))
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
    val (scales, probeReg, regs) = Bench.gate(
      Seq(noisy, noisy, noisy), floors,
      IndexedSeq(0.14, 0.14, 0.14, 0.09))
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
    val (_, _, regs) = Bench.gate(Seq(slow, fast, slow), floors, quietProbes)
    assert(regs.isEmpty, s"one clean pass must clear the query: $regs")
  }

  test("a spiky-bracket discount is bounded by the cap (accepted residual)") {
    // a load blip that hits BOTH probe samples around one pass while the
    // pass itself stayed quiet grants that pass an undeserved discount —
    // bounded at NoiseScaleCap. A regression beyond cap x factor (here
    // 10x floor vs 2.5 cap x 3.5 factor = 8.75x) still cannot hide.
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val slow = Map(probe -> 0.10, "a" -> 5.00) // 10x its floor, every pass
    val (_, _, regs) = Bench.gate(
      Seq(slow, slow, slow), floors,
      IndexedSeq(0.40, 0.40, 0.10, 0.10)) // pass 1 bracket spiked 4x
    assert(regs.size == 1 && regs.head.contains("\"query\":\"a\""))
  }

  test("floorless and failed queries are never flagged; no-floor probe disables correction") {
    val floors = Map("a" -> 0.50)
    val p = Map("new_query" -> 9.0, "failed_q" -> -1.0, "a" -> 0.40)
    val (scales, probeReg, regs) =
      Bench.gate(Seq(p, p, p), floors, IndexedSeq.fill(4)(0.20))
    assert(scales.forall(_ == 1.0) && !probeReg && regs.isEmpty)
  }

  test("invalid probe samples fall back to the valid bracket side, else no correction") {
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val p = Map(probe -> 0.10, "a" -> 0.40)
    val (scales, _, _) = Bench.gate(
      Seq(p, p, p), floors, IndexedSeq(-1.0, 0.15, -1.0, -1.0))
    assert(math.abs(scales(0) - 1.5) < 1e-9 && math.abs(scales(1) - 1.5) < 1e-9
      && scales(2) == 1.0, s"$scales")
  }
}
