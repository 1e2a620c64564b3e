package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: four passes. Pass 1 (cold) exercises each query once —
  * this pays parquet footer reads, codegen compilation, JIT, and any
  * one-time index builds; its per-query times are emitted as
  * `queries_cold` and its total as `cold_total`. The headline `value` /
  * `queries` numbers are the per-query MIN over THREE warm passes:
  * steady-state execution time, which is what a long-running job at real
  * scale experiences (JIT and codegen amortize within the first seconds
  * of a 100 TB run). Min-of-3 — not min-of-2 — because two consecutive
  * driver artifacts showed a uniform ~1.3–1.5× drift across queries whose
  * code had not changed; a third sample makes a single slow pass unable
  * to move any query's reported number. The host's `/proc/loadavg` is
  * captured before and after the run (`loadavg_before` / `loadavg_after`)
  * so a loaded shared host is visible IN the artifact instead of being
  * re-litigated from per-query deltas a round later.
  *
  * On top of loadavg, the artifact carries CALIBRATION PROBES: two pinned
  * cheap queries ([[ProbeQueries]] — one scan-bound, one shuffle/window-
  * bound, because host drift hits those subsystems unevenly) re-measured
  * (min of 3 each) before the first warm pass, between each pair of
  * passes, and after the last — four bracket points per probe — and
  * `noise_index = max/min` over probe 1's samples is emitted (see the
  * `noise_index_def` artifact field: the 4-sample definition dates from
  * r13; earlier artifacts used 2 endpoint samples and read systematically
  * lower). The probes' code never changes round to round, so samples well
  * above a probe's committed floor label the bracketed PASSES as noisy —
  * per-query spikes in passes whose brackets also spiked are host load,
  * not regressions, adjudicated from the artifact itself rather than by a
  * judge-side re-measure (see [[gate]] for why the correction is
  * per-pass and per-probe-max).
  */
object Bench {
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  /** The pinned calibration queries — cheap, stable, code unchanged round
    * to round. TWO probes because host drift is not one-dimensional: the
    * round-13 calibration showed the scan-bound probe UNDER-correcting
    * shuffle/window-bound drift (15 spontaneous 2.0–2.9× min-of-3 drifts
    * on byte-identical code, which forced the per-query factor out to
    * 3.5). `q6_filter_agg` is scan/filter-bound (parquet read + partial
    * agg, no wide exchange); `window_rank` is exchange + sort bound (a
    * doc-keyed window over orders). Each pass is corrected by whichever
    * probe's bracket drifted MORE, so shuffle-bound queries get a
    * shuffle-bound correction. */
  private[graft] val ProbeQueries = Seq("q6_filter_agg", "window_rank")

  /** Probe 1, kept as the artifact's legacy `probe_*` fields so
    * cross-round artifact comparisons keep their meaning. */
  private val ProbeQuery = ProbeQueries.head

  /** Regression threshold vs the committed floor, after noise correction.
    * Calibrated against MEASURED same-binary variance, exactly as the
    * slope gate's 4× factor was. History: the round-13 calibration pair
    * (idle-morning floor run vs ordinary-afternoon run, ONE scan-bound
    * probe) showed corrected ratios up to 2.93× on code-identical
    * queries — the scan probe could not see the shuffle/window-bound
    * drift, so the factor was widened to 3.5 to absorb the blindness.
    * Round 14 added the shuffle-bound second probe (the drift now has a
    * measuring instrument) and re-derived the factor from a fresh
    * same-binary pair on the shipped binary: A-vs-B min-of-3 ratios
    * p50 = 1.13, p99 = 1.58, max = 1.69; worst vs committed floors 2.07×.
    * 2.5 clears that measured band with margin while restoring the
    * sensitivity the 3.5 widening cost — a genuine plan bend (the
    * quadratics and cartesians this gate exists for) shows 5-10×. The
    * probe self-gate keeps its own tighter [[ProbeRegressionFactor]]:
    * probes are pinned code measured 12× per run (4 points × min-of-3),
    * with none of the per-query suite variance this factor absorbs. */
  private val RegressionFactor = 2.5

  /** Probe self-gate threshold — deliberately TIGHTER than
    * [[RegressionFactor]]: a uniform engine-wide slowdown in the 2-3.5×
    * band would pass every capped-corrected per-query check, and this
    * uncorrected 2× verdict on the pinned probe is what still turns the
    * artifact red there (the adversarial property BenchGateSpec pins). */
  private val ProbeRegressionFactor = 2.0

  /** Ceiling on the noise correction. The probe runs THROUGH the engine
    * under test, so an engine-wide slowdown (a scan/filter-path
    * regression) inflates the probe exactly like every other query and
    * unbounded division would silently launder a uniform regression into
    * a "noisy host" verdict. Two defenses: (a) the probe itself is gated
    * UNCORRECTED against its own floor — a drifted probe is a loud
    * `probe_regression` entry in the artifact, never a universal excuse —
    * and (b) the correction other queries receive is capped here, so a
    * wildly drifted probe degrades the per-query gate's sensitivity by
    * at most this factor (worst combined masking is cap ×
    * [[RegressionFactor]] per query) — bounded, and the uniform case
    * that could exploit it is exactly what the tighter uncorrected
    * probe self-gate catches first. */
  private val NoiseScaleCap = 2.5

  /** Committed per-query warm floors (`bench_floors.json`): the best
    * idle-host min-of-3 warm time each query has recorded, keyed by the
    * SF-dir basename so floors measured at sf0.1 never gate an sf0.01 run.
    * The artifact's `regressions` list carries every query whose
    * noise-corrected warm time exceeds [[RegressionFactor]] × its floor —
    * the memory the calibration probe lacked: a spike in a quiet run is a
    * REGRESSION verdict in the artifact itself, not a judge-side
    * re-measure a round later. Noise correction is PER PASS: each warm
    * pass is divided by `max(1, bracket_min / probe_floor)` where the
    * bracket is the pass's two adjacent probe samples (see [[gate]]) —
    * the probe's code is pinned, so its drift above its own floor
    * measures the host, not the engine. `SPARK_GRAFT_UPDATE_FLOORS=1`
    * rewrites the file with
    * min(old, new) per query (adding new queries), which is how floors
    * ratchet down on idle hosts and never ratchet up.
    */
  private def floorsPath: String =
    sys.env.getOrElse("SPARK_GRAFT_FLOORS", "bench_floors.json")

  /** The SF the committed floors file was measured at (None = no file /
    * unreadable) — guards both gating AND updating: a run at another SF
    * must neither gate against nor overwrite sf0.1's floors. */
  private def floorsFileSf: Option[String] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      Some(om.readTree(new java.io.File(floorsPath)).path("sf").asText(""))
        .filter(_.nonEmpty)
    } catch { case _: Throwable => None }

  private def readFloorsSection(sfBase: String, section: String): Map[String, Double] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(new java.io.File(floorsPath))
      if (root.path("sf").asText("") != sfBase) Map.empty
      else {
        val it = root.path(section).properties().iterator()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
        b.result()
      }
    } catch { case _: Throwable => Map.empty }

  private def readFloors(sfBase: String): Map[String, Double] =
    readFloorsSection(sfBase, "floors")

  /** Committed per-query COLD floors (best-ever cold-pass time, ratcheted
    * with the warm floors): the reference the cold-band detector
    * normalizes against. The run median can't distinguish "this query's
    * cold is always expensive" (heavy codegen, one-time index builds —
    * its floor is equally high, ratio ~1) from "these adjacent queries
    * paid an anomalous cold cost this run" (the r13 morning band: many ×
    * their own usual cold) — per-query floors can. Absent from pre-r14
    * floors files; the detector is silent until a floor-updating run
    * writes them. */
  private def readColdFloors(sfBase: String): Map[String, Double] =
    readFloorsSection(sfBase, "cold_floors")

  /** Locale-pinned decimal formatting — a comma-decimal default locale
    * would otherwise emit invalid JSON that readFloors silently swallows,
    * disabling the gate with no trace. */
  private def num(fmt: String, v: Double): String =
    String.format(java.util.Locale.ROOT, fmt, Double.box(v))

  /** The per-query regression gate, pure for the spec's sake: given the
    * PER-PASS warm times, the committed floors, and the interleaved probe
    * samples (one measured before pass 1, one between each pair of
    * passes, one after the last — `probeSamples.length = passes + 1`),
    * returns (per-pass noise scales, probe_regression, regression JSON
    * fragments).
    *
    * Why per-pass: the r12 driver artifact showed TRANSIENT host load —
    * probe 1.28× its floor before the warm passes, back UNDER the floor
    * after them — and a single before/after-min correction (the old
    * design) read 1.0 while the passes in between ran loaded, flagging
    * eight code-identical queries at ~2.0–2.4×. Each pass is now
    * adjudicated by its own probe BRACKET (min of the two adjacent
    * samples — the conservative side, so a quiet moment next to a noisy
    * pass corrects LESS, not more), and the gated statistic is the MIN
    * over passes of the bracket-corrected time — the same estimator the
    * headline uses, for the same reason: per-pass times on a busy
    * 180-query suite swing 2-3× from AQE strategy flips and allocation
    * pressure with unchanged code (the round-12 same-binary variance
    * table), so any statistic that lets one or two slow passes carry the
    * verdict flags healthy queries on every run (a majority vote was
    * tried first and flagged 12 code-identical queries on an idle host).
    * The accepted residual: a probe bracket that spikes while the pass
    * between its samples stayed quiet grants that pass an undeserved
    * discount of at most [[NoiseScaleCap]] — bounded, requires BOTH
    * adjacent samples (each itself a min-of-3) to spike, and any
    * regression so masked is still caught by the next idle-host run
    * against the permanent floor.
    *
    * Adversarial properties the spec pins (unchanged from the old gate):
    *   - the probe is judged UNCORRECTED against its own floor — its own
    *     drift can never divide itself under the gate;
    *   - every pass's correction is capped at [[NoiseScaleCap]], so an
    *     engine-wide slowdown inflating the probe cannot fully launder a
    *     uniform regression (and the probe_regression verdict fires
    *     loudly at 2× regardless);
    *   - floorless/failed queries are never flagged.
    */
  private[graft] def gate(warmPasses: Seq[Map[String, Double]],
      floors: Map[String, Double],
      probeSamples: Map[String, IndexedSeq[Double]])
      : (Seq[Double], Boolean, Seq[String], Seq[String]) = {
    val scales = warmPasses.indices.map { i =>
      val perProbe = probeSamples.toSeq.flatMap { case (p, samples) =>
        floors.get(p).filter(_ > 0).flatMap { pf =>
          val bracket = Seq(
            samples.lift(i).getOrElse(-1.0),
            samples.lift(i + 1).getOrElse(-1.0)).filter(_ > 0)
          if (bracket.nonEmpty) Some(bracket.min / pf) else None
        }
      }
      if (perProbe.nonEmpty)
        math.min(NoiseScaleCap, math.max(1.0, perProbe.max))
      else 1.0
    }
    // Probe self-gate on the SECOND-SMALLEST valid sample (ADVICE r13):
    // the old all-samples-min was unanimity — an engine-wide slowdown
    // that dipped under the factor during a single probe window evaded
    // the verdict while still collecting per-pass corrections elsewhere.
    // Second-smallest means one lucky window cannot clear a sustained
    // slowdown, while one unlucky window still cannot convict a healthy
    // engine (min-of-3 per sample already absorbs blips).
    val probeRegression = probeSamples.exists { case (p, samples) =>
      floors.get(p).filter(_ > 0).exists { pf =>
        val valid = samples.filter(_ > 0).sorted
        val stat = if (valid.size >= 2) valid(1)
                   else if (valid.size == 1) valid.head else -1.0
        stat > ProbeRegressionFactor * pf
      }
    }
    val names = warmPasses.flatMap(_.keys).distinct.sorted
    val verdicts = names.flatMap { k =>
      val raw = warmPasses.flatMap(_.get(k)).filter(_ >= 0)
      val adjusted = warmPasses.zip(scales).flatMap { case (p, s) =>
        // a probe never corrects itself (or its sibling probe)
        p.get(k).filter(_ >= 0)
          .map(t => if (ProbeQueries.contains(k)) t else t / s)
      }
      floors.get(k) match {
        case Some(f) if adjusted.nonEmpty && f > 0 =>
          Some((k, raw.min, adjusted.min, f))
        case _ => None
      }
    }
    val regressions = verdicts.collect {
      case (k, rawMin, adjMin, f) if adjMin > RegressionFactor * f =>
        s"""{"query":"$k","warm_sec":$rawMin,"floor_sec":$f,"adjusted_sec":$adjMin,"ratio":${num("%.2f", adjMin / f)}}"""
    }
    // Soft-warning list (ADVICE r13): queries whose UNCORRECTED min
    // clears the factor while the corrected verdict stays green — the
    // candidates a correction may be masking, surfaced by name so a
    // judge (or the next idle-host run) can re-measure them instead of
    // trusting the discount blindly. Advisory only: not a red verdict.
    val maskedWarnings = verdicts.collect {
      case (k, rawMin, adjMin, f)
          if rawMin > RegressionFactor * f && adjMin <= RegressionFactor * f =>
        k
    }
    (scales, probeRegression, regressions, maskedWarnings)
  }

  /** Cold-band detector (VERDICT r13 item 6): the one unexplained r13
    * artifact was a 437 s cold pass whose slowness was POSITION-localized
    * (execution positions 28–35 ran many times their usual cold cost,
    * everything around them normal) — transient host state, but nothing
    * machine-flagged it. This flags maximal runs of ≥ [[ColdBandRun]]
    * CONSECUTIVE queries (execution order) whose cold time is ≥
    * [[ColdBandFactor]] × their OWN committed cold floor. The first cut
    * of this detector normalized by the run's median cold/warm ratio and
    * immediately false-flagged three adjacent heavy-codegen queries on a
    * healthy idle run — "always-expensive cold" is indistinguishable from
    * "anomalously expensive cold" without a per-query reference, which is
    * what the cold floors are. Floorless queries are neutral (never
    * flagged, and they break a run — conservative for new queries).
    * Factor calibrated on a same-binary A/B pair: cold ratios p99 = 1.71,
    * max = 1.97 — 3.0 clears the measured band; the morning band ran
    * ~10-20× usual colds. Advisory: emitted as `cold_band`. */
  private val ColdBandRun = 3
  private val ColdBandFactor = 3.0
  private[graft] def coldBand(coldOrdered: Seq[(String, Double)],
      coldFloors: Map[String, Double]): Seq[String] = {
    val flagged = coldOrdered.map { case (k, c) =>
      (k, c > 0 && coldFloors.get(k).exists(f =>
        f > 0 && c >= ColdBandFactor * f))
    }
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < flagged.size) {
      if (flagged(i)._2) {
        var j = i
        while (j < flagged.size && flagged(j)._2) j += 1
        if (j - i >= ColdBandRun) out ++= flagged.slice(i, j).map(_._1)
        i = j
      } else i += 1
    }
    out.result()
  }

  private def writeFloors(sfBase: String, merged: Map[String, Double],
      mergedCold: Map[String, Double]): Unit = {
    def section(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""    "$k": ${num("%.4f", v)}""" }
      .mkString(",\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(floorsPath),
      s"""{\n  "sf": "$sfBase",\n  "floors": {\n${section(merged)}\n  },\n  "cold_floors": {\n${section(mergedCold)}\n  }\n}\n""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local-iteration subset (comma-separated names); the driver never sets
    // it, so the contract run always measures every query — and floor
    // updates are refused on a subset run below, so a partial measurement
    // can never overwrite the full-sweep floors file
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .filter(_.nonEmpty) // a blank env var means "all", not "none"
    val bench = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val loadBefore = loadavg()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NTZ fixture columns are interpreted in the session zone; pin UTC so
      // bench sees the same instants as Verify/tests on any host (ADVICE r9)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A failed query is reported as -1 sec and listed in `failed` — never
    // silently folded into a normal-looking wall time. The ordered seq is
    // kept alongside the map: the cold-band detector reads EXECUTION
    // order (a band is a position property, invisible in a name-keyed map).
    def pass(): (Seq[(String, Double)], List[String]) = {
      val failed = List.newBuilder[String]
      val times = bench.toSeq.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"bench: query $name FAILED: $e")
            failed += name
            false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
      (times, failed.result())
    }
    // min-of-3 single-query timing for each calibration probe (run after
    // the cold pass so codegen/JIT are already paid on both measurements)
    def probe(): Map[String, Double] = ProbeQueries.map { p =>
      // probes are always the full-map queries: subset runs still calibrate
      p -> (SparkEntry.queries.get(p) match {
        case Some(fn) =>
          val reps = Seq.fill(3) {
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
            catch { case _: Throwable => -1.0 }
          }.filter(_ >= 0)
          if (reps.nonEmpty) reps.min else -1.0
        case None => -1.0
      })
    }.toMap
    val (coldOrdered, coldFailed) = pass()
    val cold = coldOrdered.toMap
    // interleaved probe samples: one point before the first warm pass, one
    // between each pair, one after the last — point i and i+1 bracket
    // pass i; each point measures BOTH probes
    val firstProbe = probe()
    val passesThenProbes = (1 to 3).map(_ => (pass(), probe()))
    val warmPasses = passesThenProbes.map(p => (p._1._1.toMap, p._1._2))
    val probePoints = firstProbe +: passesThenProbes.map(_._2)
    val probeSamples: Map[String, IndexedSeq[Double]] =
      ProbeQueries.map(p => p -> probePoints.map(_.getOrElse(p, -1.0)).toIndexedSeq).toMap
    val probe1 = probeSamples(ProbeQuery)
    val probeBefore = probe1.head
    val probeAfter = probe1.last
    // noise_index definition (v2 since r13, unchanged here): max/min over
    // probe 1's FOUR interleaved samples — systematically ≥ the pre-r13
    // two-endpoint definition on the same host; cross-round comparisons
    // against r12-or-earlier artifacts must not read the shift as noise.
    val validProbe = probe1.filter(_ > 0)
    val noiseIndex =
      if (validProbe.nonEmpty) validProbe.max / validProbe.min else -1.0
    // a pass-transient failure keeps the other passes' valid measurements
    // (the query is still listed in `failed`); -1 only when all failed
    val warm = cold.keys.map { k =>
      val valid = warmPasses.flatMap(_._1.get(k)).filter(_ >= 0)
      k -> (if (valid.nonEmpty) valid.min else -1.0)
    }.toMap
    def timesJson(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val failed =
      (coldFailed ++ warmPasses.flatMap(_._2)).distinct.sorted
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = warm.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    val loadAfter = loadavg()
    // ---- regression gate vs committed floors (noise-corrected) ----
    val sfBase = new java.io.File(sfDir).getName
    val floors = readFloors(sfBase)
    // host_band (VERDICT r16 item 6): the stamped how-loaded-was-this-host
    // factor that makes cross-round cold_total/warm comparisons readable
    // from the artifact alone (the r16 driver bench ran at loadavg ~9 and
    // its 192 s cold_total overstated an unchanged binary by ~12% — a
    // judge-side idle re-run was needed to settle it). Per probe: the MIN
    // over its interleaved samples divided by its committed floor — the
    // most conservative sustained-load estimate (a transient spike leaves
    // it ~1, and dividing by 1 corrects nothing — honest); across probes:
    // the MAX (drift hits scan- and shuffle-bound subsystems unevenly;
    // read the worse one). 1.0 ≈ idle host; -1 when no probe floor is
    // committed. Uncapped and advisory: the gating path keeps its own
    // capped per-pass corrections.
    val hostBand = {
      val perProbe = probeSamples.toSeq.flatMap { case (p, samples) =>
        floors.get(p).filter(_ > 0).flatMap { pf =>
          val valid = samples.filter(_ > 0)
          if (valid.nonEmpty) Some(valid.min / pf) else None
        }
      }
      if (perProbe.nonEmpty) perProbe.max else -1.0
    }
    val (passScales, probeRegression, regressions, maskedWarnings) =
      gate(warmPasses.map(_._1), floors, probeSamples)
    val regressionsJson = regressions.mkString("[", ",", "]")
    val maskedJson = maskedWarnings.map("\"" + _ + "\"").mkString("[", ",", "]")
    val band = coldBand(coldOrdered, readColdFloors(sfBase))
    val coldBandJson = band.map("\"" + _ + "\"").mkString("[", ",", "]")
    // reported noise_scale = the largest per-pass correction applied (the
    // human-readable "how loaded did this run get" number)
    val noiseScale = if (passScales.nonEmpty) passScales.max else 1.0
    val probeSamplesJson = probe1.map(p => num("%.6f", p)).mkString("[", ",", "]")
    val probesJson = ProbeQueries.map { p =>
      "\"" + p + "\":" +
        probeSamples(p).map(v => num("%.6f", v)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val passScalesJson = passScales.map(s => num("%.3f", s)).mkString("[", ",", "]")
    if (sys.env.get("SPARK_GRAFT_UPDATE_FLOORS").contains("1") && only.isEmpty) {
      // never overwrite floors measured at a DIFFERENT SF — a sf0.01 run
      // must not destroy the committed sf0.1 floors
      if (floorsFileSf.forall(_ == sfBase)) {
        def merge(old: Map[String, Double], fresh: Map[String, Double]) =
          (old.keySet ++ fresh.keySet).flatMap { k =>
            // a brand-new query that failed every pass has no floor
            // candidate yet — skip it rather than crash on empty min
            Seq(old.get(k), fresh.get(k).filter(_ >= 0)).flatten match {
              case Nil => None
              case cs => Some(k -> cs.min)
            }
          }.toMap
        val merged = merge(floors, warm)
        val mergedCold = merge(readColdFloors(sfBase),
          cold.filter(_._2 >= 0))
        writeFloors(sfBase, merged, mergedCold)
        System.err.println(s"bench: floors updated at $floorsPath (${merged.size} queries)")
      } else System.err.println(
        s"bench: floors NOT updated — file is for ${floorsFileSf.get}, this run is $sfBase")
    }
    val jsonLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":${timesJson(warm)},"queries_cold":${timesJson(cold)},"cold_total":$coldTotal,"warm_passes":3,"probe_query":"$ProbeQuery","probe_before_sec":$probeBefore,"probe_after_sec":$probeAfter,"probe_samples":$probeSamplesJson,"probes":$probesJson,"pass_scales":$passScalesJson,"noise_index":$noiseIndex,"noise_index_def":"max/min over probe 1's 4 interleaved samples (v2 since r13)","noise_scale":${num("%.3f", noiseScale)},"host_band":${num("%.3f", hostBand)},"host_band_def":"max over probes of (min interleaved sample / committed floor); ~1.0 = idle host, read cross-round cold_total/warm deltas against it","probe_regression":$probeRegression,"uncorrected_over_factor":$maskedJson,"cold_band":$coldBandJson,"floors_sf":"${if (floors.nonEmpty) sfBase else ""}","regressions":$regressionsJson,"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","failed":$failedJson,"sf":"$sfDir"}"""
    println(jsonLine)
    // Sidecar mirror of the one-line JSON (r18, VERDICT r17 item 3): the
    // r16→r17 driver comparison came up EMPTY because the driver archives
    // only a bounded stdout tail and the per-query dict outgrew it, so
    // the archived line no longer parsed. The file is the whole-line copy
    // a reader can always load; stdout keeps the contract line unchanged.
    // Additive only — full runs AND subset runs write it (it records its
    // own `sf` and query set, so a reader can tell them apart).
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_SIDECAR", "bench_last.json")),
      jsonLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"bench: sidecar write failed: $e")
    }
    if (failed.nonEmpty) System.err.println(s"bench: ${failed.size} queries failed: ${failed.mkString(", ")}")
    spark.stop()
  }
}
