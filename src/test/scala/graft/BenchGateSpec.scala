package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate is load-bearing — it replaced judge-side
  * re-measures as the mechanism that adjudicates per-query drift — so its
  * adversarial properties get pinned here rather than re-argued from the
  * artifact each round (ADVICE r11: an engine-wide slowdown used to
  * divide itself out through the probe).
  */
class BenchGateSpec extends AnyFunSuite {
  // Bench.ProbeQuery is q6_filter_agg; use the real name so the
  // probe-special-casing under test is the production path
  private val probe = "q6_filter_agg"

  test("quiet run, one real regression: flagged; others pass") {
    val floors = Map(probe -> 0.10, "a" -> 0.50, "b" -> 0.30)
    val warm = Map(probe -> 0.10, "a" -> 1.20, "b" -> 0.35)
    val (scale, probeReg, regs) = Bench.gate(warm, floors, probeNow = 0.10)
    assert(scale == 1.0 && !probeReg)
    assert(regs.size == 1 && regs.head.contains("\"query\":\"a\""))
  }

  test("uniform engine-wide slowdown cannot launder itself through the probe") {
    // everything (probe included) 4x slower: pre-fix, noise_scale = 4
    // divided every query back under its floor and the artifact read
    // clean. Now the cap keeps the correction at 2.5 (so 4x/2.5 = 1.6x
    // adjusted -> still under the 2x factor for others... but) the probe
    // itself is judged uncorrected and turns the run loudly red.
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val warm = Map(probe -> 0.40, "a" -> 2.00)
    val (scale, probeReg, _) = Bench.gate(warm, floors, probeNow = 0.40)
    assert(scale == 2.5, s"noise scale must cap at 2.5, got $scale")
    assert(probeReg, "a 4x probe drift must be a probe_regression verdict")
  }

  test("extreme uniform slowdown flags the non-probe queries too") {
    // 6x across the board: capped correction 2.5 leaves a 2.4x adjusted
    // ratio on 'a' -> flagged even before anyone reads probe_regression
    val floors = Map(probe -> 0.10, "a" -> 0.50)
    val warm = Map(probe -> 0.60, "a" -> 3.00)
    val (_, probeReg, regs) = Bench.gate(warm, floors, probeNow = 0.60)
    assert(probeReg)
    assert(regs.exists(_.contains("\"query\":\"a\"")))
  }

  test("genuinely noisy host within the cap is corrected, not flagged") {
    // probe 2x over floor (host contention), queries 2.2x: adjusted to
    // 1.1x -> quiet, exactly the r10-outlier adjudication the gate
    // automated
    val floors = Map(probe -> 0.10, "a" -> 0.50, "b" -> 0.30)
    val warm = Map(probe -> 0.20, "a" -> 1.10, "b" -> 0.66)
    val (scale, probeReg, regs) = Bench.gate(warm, floors, probeNow = 0.20)
    assert(scale == 2.0)
    assert(regs.isEmpty, s"corrected run must be quiet: $regs")
    assert(!probeReg, "2x is exactly the factor, not beyond it")
  }

  test("floorless and failed queries are never flagged; no-floor probe disables correction") {
    val floors = Map("a" -> 0.50)
    val warm = Map("new_query" -> 9.0, "failed_q" -> -1.0, "a" -> 0.40)
    val (scale, probeReg, regs) = Bench.gate(warm, floors, probeNow = 0.2)
    assert(scale == 1.0 && !probeReg && regs.isEmpty)
  }
}
