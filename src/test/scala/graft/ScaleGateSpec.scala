package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleDrill

/** The drill gate gets the bench gate's adversarial pinning (VERDICT r16
  * item 3 — the CellArgmax lesson: a real ~1.9× ×100 regression sat under
  * the old 4× factor for a full round because the drill had no noise
  * instrument, so its factor carried the whole host-band burden). The
  * properties below are the BenchGateSpec set translated to the drill's
  * shape: one probe family bracketing every leg, per-family bracket-min
  * correction, uncorrected second-smallest probe self-gate, a red factor
  * derived from the measured ~15% host band instead of the noise-era 4×,
  * and a documented bimodal-family exemption.
  */
class ScaleGateSpec extends AnyFunSuite {
  private val probe = ScaleDrill.ProbeFamily // dedup_exact

  // floors: probe 0.20s; family 'a' 10s; family 'b' 5s
  private def floors(extra: (String, (Double, Double))*) =
    Map(probe -> ((0.20, 0.02)),
      "a" -> ((10.0, 0.5)), "b" -> ((5.0, 0.4))) ++ extra

  private def quiet(n: Int) = IndexedSeq.fill(n + 1)(0.20)

  test("quiet host, one planted 2x regression: red (the CellArgmax class)") {
    val rows = Seq(("a", 20.0, 0.55), ("b", 5.2, 0.41))
    val (corr, probeReg, red, _) = ScaleDrill.gate(rows, floors(), quiet(2))
    assert(corr.forall(_ == 1.0) && !probeReg)
    assert(red.size == 1 && red.head.contains("\"family\":\"a\""),
      s"a 2.0x corrected ratio must exceed the ${ScaleDrill.SlopeBigFactor} red factor: $red")
  }

  test("uniform 1.5x host slowdown corrects itself away, fires nothing") {
    // probe brackets read 1.5x the floor; both families 1.5x theirs —
    // corrected ratios land back at 1.0. The old 4x gate was quiet here
    // too, but only because it was quiet about everything.
    val rows = Seq(("a", 15.0, 0.55), ("b", 7.5, 0.42))
    val samples = IndexedSeq.fill(3)(0.30)
    val (corr, probeReg, red, warn) = ScaleDrill.gate(rows, floors(), samples)
    assert(corr.forall(c => math.abs(c - 1.5) < 1e-9))
    assert(red.isEmpty && warn.isEmpty,
      s"uniform host drift must not convict: $red $warn")
    assert(!probeReg, "1.5x is under the 2x probe self-gate")
  }

  test("engine-wide 4x slowdown: correction caps, probe turns red uncorrected") {
    val rows = Seq(("a", 40.0, 0.7))
    val samples = IndexedSeq.fill(2)(0.80)
    val (corr, probeReg, red, _) = ScaleDrill.gate(rows, floors(), samples)
    assert(corr.forall(_ == ScaleDrill.SlopeNoiseCap),
      s"correction must cap at ${ScaleDrill.SlopeNoiseCap}: $corr")
    assert(probeReg, "an engine-wide slowdown must not launder itself")
    // 40 / 2.5 = 16 = 1.6x floor — under red for the family, but the
    // probe verdict already turned the artifact red
    assert(red.isEmpty)
  }

  test("documented bimodal family keeps the legacy factor but still warns") {
    val fl = floors("dedup_clusters" -> ((11.9, 0.48)))
    val rows = Seq(("dedup_clusters", 24.1, 0.5)) // the healthy r16 2.02x
    val (_, _, red, warn) = ScaleDrill.gate(rows, fl, quiet(1))
    assert(red.isEmpty, s"healthy bimodality must not be red: $red")
    assert(warn == Seq("dedup_clusters"),
      "the warn tier still names a hot bimodal family")
    // but a genuine quadratic bend on it (5x) still turns red
    val (_, _, red5, _) =
      ScaleDrill.gate(Seq(("dedup_clusters", 60.0, 0.9)), fl, quiet(1))
    assert(red5.nonEmpty)
  }

  test("warn tier names the in-between band; clean families stay silent") {
    val rows = Seq(("a", 15.0, 0.55), ("b", 5.2, 0.41))
    val (_, _, red, warn) = ScaleDrill.gate(rows, floors(), quiet(2))
    assert(red.isEmpty)
    assert(warn == Seq("a"), s"1.5x is warn-tier, 1.04x is silent: $warn")
  }

  test("floorless and failed families are never flagged") {
    val rows = Seq(("fresh", 99.0, 1.2), ("a", -1.0, -1.0))
    val (_, _, red, warn) = ScaleDrill.gate(rows, floors(), quiet(2))
    assert(red.isEmpty && warn.isEmpty,
      "no floor -> seed next round; failed -> surfaces in `failed`, not here")
  }

  test("the probe never corrects itself") {
    // probe drilled as a family while its brackets drift 2.5x: its own
    // t_big is judged raw, so a probe regression cannot hide in its own
    // correction
    val rows = Seq((probe, 0.50, 0.1))
    val samples = IndexedSeq.fill(2)(0.50)
    val (_, probeReg, red, _) = ScaleDrill.gate(rows, floors(), samples)
    assert(probeReg)
    assert(red.nonEmpty && red.head.contains(s""""family":"$probe""""),
      s"probe 2.5x its floor must be red uncorrected: $red")
  }

  test("one lucky probe window cannot clear a sustained slowdown") {
    // second-smallest statistic: samples (0.20, 0.55, 0.55) — the single
    // quiet point does not acquit
    val rows = Seq(("a", 10.0, 0.5), ("b", 5.0, 0.4))
    val samples = IndexedSeq(0.20, 0.55, 0.55)
    val (_, probeReg, _, _) = ScaleDrill.gate(rows, floors(), samples)
    assert(probeReg)
  }

  test("missing probe samples degrade to no correction, not a crash") {
    val rows = Seq(("a", 10.5, 0.5))
    val (corr, probeReg, red, _) =
      ScaleDrill.gate(rows, floors(), IndexedSeq(-1.0, -1.0))
    assert(corr == Seq(1.0) && !probeReg && red.isEmpty)
  }
}
