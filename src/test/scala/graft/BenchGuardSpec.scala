package graft

import org.scalatest.funsuite.AnyFunSuite

/** The quiet-record gate: a contended bench run must route its durable
  * record to the `_contended` twin instead of clobbering the committed
  * quiet `BENCH_full.json` (the r9/r10 recurring incident, closed
  * structurally here). Pure-function spec — no Spark session. */
class BenchGuardSpec extends AnyFunSuite {

  // the r10 committed quiet run's actual brackets
  private val quietCpu = (1.95, 1.85)
  private val quietW = (523.0, 540.0)

  test("quietRecord: the r10 committed quiet brackets pass") {
    assert(Bench.quietRecord(quietCpu._1, quietCpu._2, quietW._1, quietW._2))
  }

  test("quietRecord: the r10 judged incident (end cpu 5x start) is contended") {
    // end calibration cpu 9.02 s vs 1.81 s start — the artifact that
    // convicted the r10 judged run
    assert(!Bench.quietRecord(1.81, 9.02, 500.0, 480.0))
  }

  test("quietRecord: the r9 storage-axis incident (write 636->474) still passes relative band") {
    // a 25% write drop is within the 2x relative band AND the absolute
    // floor — r9's judged total was adjudicated by isolation runs, not
    // by refusing the record; the gate targets the 2x+ class
    assert(Bench.quietRecord(1.9, 2.0, 636.0, 474.0))
    // but a halving does not
    assert(!Bench.quietRecord(1.9, 2.0, 636.0, 300.0))
  }

  test("quietRecord: a run contended from the START fails the absolute band") {
    // relative drift is zero (start == end) yet both brackets sit far
    // outside the host band — without the absolute check this would
    // clobber the quiet record with uniformly-slow numbers
    assert(!Bench.quietRecord(9.0, 9.0, 500.0, 500.0))
    assert(!Bench.quietRecord(1.9, 1.9, 80.0, 80.0))
  }

  test("quietRecord: band overrides widen the envelope for other host classes") {
    assert(Bench.quietRecord(9.0, 9.0, 80.0, 80.0,
      cpuBandSec = 12.0, writeBandMbps = 50.0))
  }

  test("quietRecord: a mid-run contention window routes to _contended with endpoints in band") {
    // the r11 blind spot: both endpoint brackets in band (the actual
    // BENCH_r11 values), yet a load window inside the query loop — seen
    // only by the interleaved micro-probes — inflated eight queries 3-6x.
    // Worst probe 1.1 s vs the 0.4 s default band (4.0 * 0.10; r12 ran
    // at 0.15x = 0.6 s, tightened since) → contended.
    val probesWithBurst = Seq(0.21, 0.19, 1.10, 0.95, 0.22)
    assert(!Bench.quietRecord(1.96, 1.78, 589.0, 599.0,
      midProbesSec = probesWithBurst))
    // the same endpoints with an all-quiet probe series stay quiet
    assert(Bench.quietRecord(1.96, 1.78, 589.0, 599.0,
      midProbesSec = Seq(0.21, 0.19, 0.24, 0.20, 0.22)))
    // no probes (escape-hatch partial runs) degrades to the endpoint-only
    // semantics rather than refusing every record
    assert(Bench.quietRecord(1.96, 1.78, 589.0, 599.0))
    // micro-band override rescales for a slower host class
    assert(Bench.quietRecord(1.96, 1.78, 589.0, 599.0,
      midProbesSec = probesWithBurst, midProbeBandSec = 1.5))
  }

  test("quietRecord: the r12 core-theft incident (single-thread probes in band) is contended") {
    // blind spot #2, built from the actual BENCH_r12 driver-run numbers:
    // endpoint brackets cpu 1.80->2.00 s, write 574->647 MB/s — all in
    // band — AND all eight single-threaded mid-run probes read
    // 0.20–0.21 s, yet q190–q195/q202/q203 ran 3–10x over their
    // isolation-re-run class: the external load stole CORES (parallel
    // throughput), which a one-core probe cannot see. The parallel probe
    // measured under a half-the-cores load generator reads 0.55–0.73 s
    // vs its 0.30 s quiet class → out of the 0.45 s band → contended.
    val r12SingleProbes = Seq(0.21, 0.20, 0.20, 0.21, 0.20, 0.21, 0.20, 0.21)
    val parProbesTheft = Seq(0.31, 0.30, 0.61, 0.73, 0.55, 0.32, 0.30, 0.31)
    assert(!Bench.quietRecord(1.80, 2.00, 574.0, 647.0,
      midProbesSec = r12SingleProbes, midProbesParSec = parProbesTheft))
    // the committed quiet run at the same HEAD: same endpoints, same
    // single-thread series, parallel series in its quiet class → quiet
    assert(Bench.quietRecord(1.80, 2.00, 574.0, 647.0,
      midProbesSec = r12SingleProbes,
      midProbesParSec = Seq(0.31, 0.30, 0.32, 0.30, 0.31, 0.30, 0.31, 0.32)))
    // par-band override rescales for a slower host class
    assert(Bench.quietRecord(1.80, 2.00, 574.0, 647.0,
      midProbesSec = r12SingleProbes, midProbesParSec = parProbesTheft,
      midProbeParBandSec = 1.0))
  }

  test("quietRecord: tightened single-thread band (0.4 s) catches the shallow r11-class burst") {
    // r12 ran the single-thread band at 0.15x (0.6 s); a 0.5 s probe —
    // 2.5x the 0.2 s quiet class — passed. The 0.10x default (0.4 s)
    // convicts it while the 0.20–0.21 s quiet class keeps 2x headroom.
    assert(!Bench.quietRecord(1.9, 1.9, 500.0, 500.0,
      midProbesSec = Seq(0.21, 0.50, 0.20)))
    assert(Bench.quietRecord(1.9, 1.9, 500.0, 500.0,
      midProbesSec = Seq(0.21, 0.22, 0.20)))
  }

  test("quietRecord: the r13 short-burst incident (every sampled probe in band) is contended") {
    // blind spot #3, built from the ACTUAL BENCH_r13 driver-run numbers:
    // endpoints cpu 2.13->1.91 s, write 541->551 MB/s, worst mid-run
    // probe 0.27 s single / 0.33 s parallel — every existing probe in
    // band — yet q180_drift_replay ran 8.5x over class (9.80 vs 1.16 s
    // committed / 1.44 s isolation re-run) with 2-6x on the adjacent
    // q136/q139/q179/q83 cluster. The burst was SHORTER than the
    // ~25-query probe cadence, so the sampled probes never saw it. The
    // continuous host-telemetry daemon samples every ~1 s: a thief
    // holding 8+ of 32 cores over the q179/q180 window reads an
    // external-CPU window-max far above the 0.20 band → contended.
    val r13Mid = Seq(0.27, 0.22, 0.21, 0.24, 0.25, 0.25, 0.21, 0.21)
    val r13Par = Seq(0.30, 0.33, 0.29, 0.33, 0.29, 0.31, 0.29, 0.31)
    assert(!Bench.quietRecord(2.13, 1.91, 541.0, 551.0,
      midProbesSec = r13Mid, midProbesParSec = r13Par,
      hostExtMax = 0.55))
    // the committed quiet run at the same HEAD: telemetry near zero
    // (quiet class measured <=0.06 under full bench load) → quiet
    assert(Bench.quietRecord(2.13, 1.91, 541.0, 551.0,
      midProbesSec = r13Mid, midProbesParSec = r13Par,
      hostExtMax = 0.05))
    // an unprobed axis (no com.sun bean / sub-second partial run) keeps
    // endpoint semantics — never acquits, never convicts
    assert(Bench.quietRecord(2.13, 1.91, 541.0, 551.0,
      midProbesSec = r13Mid, midProbesParSec = r13Par,
      hostExtMax = -1.0))
    // band override rescales for a noisier host class
    assert(Bench.quietRecord(2.13, 1.91, 541.0, 551.0,
      hostExtMax = 0.55, hostExtBand = 0.7))
  }

  test("convictedWindows: per-query attribution + probe-span mapping") {
    val names = (0 until 100).map(i => f"q$i%03d_x")
    val medians = Seq.fill(100)(1.0)
    // a host-ext spike on one query convicts exactly that query
    val ext = Seq.tabulate(100)(i => if (i == 42) 0.55 else 0.03)
    assert(Bench.convictedWindows(names, medians, ext, 0.20,
      Nil, 0.4, Nil, 0.45, 25, Nil, 75.0, 50) === Set("q042_x"))
    // a parallel-probe spike at probe k=1 (fired before query 50)
    // convicts the unobserved span [25, 75)
    val quietExt = Seq.fill(100)(0.03)
    val par = Seq(0.30, 0.73, 0.31) // probes before queries 25, 50, 75
    val span = Bench.convictedWindows(names, medians, quietExt, 0.20,
      Nil, 0.4, par, 0.45, 25, Nil, 75.0, 50)
    assert(span === (25 until 75).map(i => f"q$i%03d_x").toSet)
    // a depressed mid-write probe maps through ITS OWN cadence (50)
    val wr = Seq(40.0) // probe before query 50 → span [0, 100)
    assert(Bench.convictedWindows(names, medians, quietExt, 0.20,
      Nil, 0.4, Nil, 0.45, 25, wr, 75.0, 50).size === 100)
    // a FAILED query (median < 0) is never convicted — failure is code
    val medFail = medians.updated(42, -1.0)
    assert(Bench.convictedWindows(names, medFail, ext, 0.20,
      Nil, 0.4, Nil, 0.45, 25, Nil, 75.0, 50) === Set.empty[String])
  }

  test("splice: a convicted-window record re-measured quiet passes the gate") {
    // the r15 recovery statement end-to-end on synthetic numbers shaped
    // like the r13 incident: endpoints and every sampled probe in band,
    // one query's host-ext window at 0.55 → the RECORD is contended and
    // the conviction maps to exactly that window; replacing the window
    // with a quiet re-run measurement (0.03) makes the spliced record's
    // judged statistic quiet — splice-to-quiet, never splice-to-hide
    // (an endpoint failure leaves convictedWindows empty-handed: the
    // recovery path requires endpointQuiet before it runs).
    val names = (0 until 100).map(i => f"q$i%03d_x")
    val ext = Seq.tabulate(100)(i => if (i == 42) 0.55 else 0.03)
    val mid = Seq(0.21, 0.22, 0.20)
    val par = Seq(0.30, 0.31, 0.29)
    assert(!Bench.quietRecord(1.9, 1.9, 500.0, 500.0,
      midProbesSec = mid, midProbesParSec = par, hostExtMax = ext.max))
    val convicted = Bench.convictedWindows(names, Seq.fill(100)(1.0),
      ext, 0.20, mid, 0.4, par, 0.45, 25, Nil, 75.0, 50)
    assert(convicted === Set("q042_x"))
    // re-run of the convicted window under quiet brackets: splice
    val splicedExt = ext.updated(42, 0.03)
    assert(Bench.quietRecord(1.9, 1.9, 500.0, 500.0,
      midProbesSec = mid, midProbesParSec = par,
      hostExtMax = splicedExt.max))
  }

  test("splice: the r15 live firings, from the actual run numbers") {
    // both of r15's full runs: endpoints in band (cpu 1.96/2.00 then
    // 1.99/1.96 s, writes 510->312 / 571->524 MB/s), one parallel probe
    // marginally over band (0.51 then 0.48 s vs 0.45), host-ext 0.11 /
    // 0.10 — the hypervisor-neighbor signature. Gate refuses the pass;
    // attribution convicts exactly the 50-query span around the bad
    // probe; the in-JVM re-run came back quiet (host-ext 0.03 / 0.02,
    // midpar 0.29) and spliced. Run 2's committed record: 131.3 s/218.
    val names = (0 until 218).map(i => f"q$i%03d_x")
    // run 2's bad probe was the FIRST (k=0, fired before query 25):
    // the real convicted set was the first 50 queries in run order
    val run2Par = Seq(0.48, 0.31, 0.30, 0.29, 0.31, 0.30, 0.29, 0.30)
    assert(!Bench.quietRecord(1.99, 1.96, 571.0, 524.0,
      midProbesParSec = run2Par, hostExtMax = 0.10))
    // endpoints alone are quiet → the recovery path is eligible
    assert(Bench.quietRecord(1.99, 1.96, 571.0, 524.0))
    val convicted = Bench.convictedWindows(names, Seq.fill(218)(1.0),
      Seq.fill(218)(0.10), 0.20, Nil, 0.4, run2Par, 0.45, 25, Nil, 75.0, 50)
    assert(convicted === (0 until 50).map(i => f"q$i%03d_x").toSet,
      s"probe k=0 must convict run-order span [0,50): ${convicted.size}")
    // the re-run's own brackets (as measured) pass the gate → splice
    assert(Bench.quietRecord(1.98, 2.08, 521.0, 533.0,
      midProbesParSec = Seq(0.29), hostExtMax = 0.02))
  }

  test("quietRecord: the external-CPU band boundary is exactly 0.20") {
    // provenance of the 0.20 default (SURVEY §8): quiet full runs on
    // this host read 0.00-0.11 window-max under full bench load; the
    // 8-of-32-core spinner validation read ~0.25; r14's contended twin
    // convicted at 0.11 via OTHER axes while the driver-run conviction
    // class reads 0.5+. 0.20 splits the measured populations with
    // margin both ways. This case pins the boundary so a future retune
    // is a deliberate edit here, not drift: 0.19 passes, 0.21 convicts.
    assert(Bench.quietRecord(1.9, 1.9, 500.0, 500.0, hostExtMax = 0.19))
    assert(!Bench.quietRecord(1.9, 1.9, 500.0, 500.0, hostExtMax = 0.21))
    // the band is inclusive at its own value
    assert(Bench.quietRecord(1.9, 1.9, 500.0, 500.0, hostExtMax = 0.20))
  }

  test("quietRecord: the r13 storage-axis blind spot (IO contention invisible to CPU probes) is contended") {
    // q180 is a storage-bound replay: an IO-contending neighbor degrades
    // it without moving ANY cpu probe, and the 256 MiB write probe only
    // ran at the endpoints. The mid-run 32 MiB fsync'd series closes the
    // axis: a member at 40 MB/s vs the 75 MB/s default band (half the
    // 150 MB/s endpoint band; quiet class 300-600 on this host) routes
    // the record to _contended even with every CPU number pristine.
    assert(!Bench.quietRecord(2.13, 1.91, 541.0, 551.0,
      midWritesMbps = Seq(480.0, 40.0, 510.0)))
    assert(Bench.quietRecord(2.13, 1.91, 541.0, 551.0,
      midWritesMbps = Seq(480.0, 390.0, 510.0)))
    // no write probes (escape-hatch runs) → endpoint semantics
    assert(Bench.quietRecord(2.13, 1.91, 541.0, 551.0))
    // band override for a slower disk class
    assert(Bench.quietRecord(2.13, 1.91, 541.0, 551.0,
      midWritesMbps = Seq(480.0, 40.0, 510.0), midWriteBandMbps = 30.0))
  }

  test("classConvictions: the r15 blind-spot-#4 incident (every probe in band) convicts the burst") {
    // built from the ACTUAL BENCH_r15 driver-run numbers the judge
    // adjudicated: probe axes all in band (cpu 1.91/2.36 vs 4.0, midpar
    // 0.44 vs 0.45, host-ext 0.09 vs 0.20, midwrite 390) — quietRecord
    // PASSES — yet the contiguous run-order span q148-q159 read 8-19x
    // its committed class. The class axis is the only one that can see
    // it: each burst member's own median against the committed record.
    assert(Bench.quietRecord(1.91, 2.36, 510.0, 520.0,
      midProbesParSec = Seq(0.44, 0.31, 0.30), hostExtMax = 0.09,
      midWritesMbps = Seq(390.0)))
    // committed class map (r15 values) and the driver run's medians
    val burst = Seq(
      ("q148_x", 0.70, 7.70), ("q149_x", 0.671, 8.66),
      ("q150_x", 0.60, 6.00), ("q151_x", 0.55, 4.40),
      ("q152_x", 0.50, 5.00), ("q153_x", 0.45, 4.95),
      ("q154_x", 0.494, 9.44), ("q155_x", 0.40, 4.40),
      ("q156_x", 0.42, 4.45), ("q157_x", 0.55, 3.03),
      ("q158_x", 0.50, 4.30), ("q159_x", 0.60, 4.20))
    val inClassRows = Seq(
      ("q001_x", 1.00, 1.08), ("q110_x", 1.81, 1.90),
      ("q146_x", 8.77, 9.20), ("q182_x", 2.86, 2.60))
    val rows = inClassRows ++ burst
    val classMap = rows.map { case (n, c, _) => n -> c }.toMap
    val convicted = Bench.classConvictions(
      rows.map(_._1), rows.map(_._3), classMap)
    assert(convicted.toSet === burst.map(_._1).toSet,
      s"the 12-query burst and ONLY the burst: $convicted")
    // faster-than-class is never convicted; a new query (absent from
    // the map) is never convicted; a FAILED query is never convicted
    assert(Bench.classConvictions(Seq("q182_x"), Seq(2.60), classMap).isEmpty)
    assert(Bench.classConvictions(Seq("q218_new"), Seq(9.0), classMap).isEmpty)
    assert(Bench.classConvictions(Seq("q154_x"), Seq(-1.0), classMap).isEmpty)
  }

  test("classConvictions: the absolute floor keeps sub-second jitter unconvicted") {
    // 3x of a 60 ms class is scheduler noise, not contention: ratio
    // alone would convict (0.20 > 3 * 0.06) but the 0.3 s excess floor
    // does not clear (0.14 s) — no conviction. A 3 s class at 3.2x
    // clears both → convicted.
    val m = Map("q_tiny" -> 0.06, "q_big" -> 3.0)
    assert(Bench.classConvictions(Seq("q_tiny"), Seq(0.20), m).isEmpty)
    assert(Bench.classConvictions(Seq("q_big"), Seq(9.6), m) === Seq("q_big"))
    // the band boundary is exclusive: exactly 3x does not convict
    assert(Bench.classConvictions(Seq("q_big"), Seq(9.0), m).isEmpty)
  }

  test("spliceAccept: out-of-class re-runs retry, only the final attempt books a regression") {
    // quiet + all-succeeded + back in class: accept on any attempt —
    // the burst re-measured in class, the normal splice
    assert(Bench.spliceAccept(reRunQuiet = true, allSucceeded = true,
      stillOutOfClass = false, attempt = 1, maxAttempts = 2))
    // probe-quiet but STILL out of class on attempt 1 of 2: ambiguous
    // (regression vs repeat burst) — retry, don't book yet
    assert(!Bench.spliceAccept(reRunQuiet = true, allSucceeded = true,
      stillOutOfClass = true, attempt = 1, maxAttempts = 2))
    // the same on the FINAL attempt: two consistent slow measurements
    // under quiet probes = the new truth, accepted (the caller labels
    // it class_reconvicted in the record)
    assert(Bench.spliceAccept(reRunQuiet = true, allSucceeded = true,
      stillOutOfClass = true, attempt = 2, maxAttempts = 2))
    // a probe-contended or failed re-run never splices, on any attempt
    assert(!Bench.spliceAccept(reRunQuiet = false, allSucceeded = true,
      stillOutOfClass = false, attempt = 2, maxAttempts = 2))
    assert(!Bench.spliceAccept(reRunQuiet = true, allSucceeded = false,
      stillOutOfClass = false, attempt = 2, maxAttempts = 2))
  }

  test("loadRecord + recordWritePath: cross-scale-factor overwrite refusal") {
    // the judge-side r15 incident: an sf0.001 bench smoke clobbered the
    // committed sf0.1 record because Bench writes BENCH_full.json by
    // default. The writer must route a mismatched-sf run to a sibling.
    val dir = java.nio.file.Files.createTempDirectory("benchguard")
    val rec = dir.resolve("BENCH_full.json")
    java.nio.file.Files.writeString(rec,
      """{"metric":"total","value":131.3,"queries":{"q154_x":0.494,"q110_x":1.81},"sf":"sf0.1"}""")
    val loaded = Bench.loadRecord(rec.toString)
    assert(loaded === Some(("sf0.1",
      Map("q154_x" -> 0.494, "q110_x" -> 1.81))))
    // same sf → in place; different sf → sibling; force flag → in place
    val p = rec.toString
    assert(Bench.recordWritePath(p, Some("sf0.1"), "sf0.1", force = false) === p)
    assert(Bench.recordWritePath(p, Some("sf0.1"), "sf0.001", force = false)
      === dir.resolve("BENCH_full_sf0.001.json").toString)
    assert(Bench.recordWritePath(p, Some("sf0.1"), "sf0.001", force = true) === p)
    // no existing record → in place (nothing to protect)
    assert(Bench.recordWritePath(p, None, "sf0.001", force = false) === p)
    // unreadable / absent / map-less records degrade to None, never throw
    assert(Bench.loadRecord(dir.resolve("absent.json").toString).isEmpty)
    java.nio.file.Files.writeString(dir.resolve("bad.json"), "not json {")
    assert(Bench.loadRecord(dir.resolve("bad.json").toString).isEmpty)
    java.nio.file.Files.writeString(dir.resolve("nomap.json"),
      """{"metric":"total","sf":"sf0.1"}""")
    assert(Bench.loadRecord(dir.resolve("nomap.json").toString).isEmpty)
  }

  test("recordReplaceAllowed: slower-record refusal, from the r16 live numbers") {
    // found live in the r16 optimization round: a spliced run on a
    // uniformly slow evening (calib 2.07, midwrite 255 MB/s, median
    // ratio-to-class 1.145 — no probe axis and no 3x class span trips
    // on a whole-run drag) replaced the 124.219 s committed record with
    // a 160.087 s one. The refusal keeps the incumbent class map.
    val incumbent = Some(124.219)
    assert(!Bench.recordReplaceAllowed(160.087, incumbent, 0.10, force = false))
    // force is the explicit accept-a-regression flag
    assert(Bench.recordReplaceAllowed(160.087, incumbent, 0.10, force = true))
    // inside the margin (a normal quiet-evening wobble) still replaces
    assert(Bench.recordReplaceAllowed(130.0, incumbent, 0.10, force = false))
    // faster always replaces
    assert(Bench.recordReplaceAllowed(118.4, incumbent, 0.10, force = false))
    // no incumbent (first run, or sf-mismatch sibling path) → nothing to protect
    assert(Bench.recordReplaceAllowed(160.087, None, 0.10, force = false))
    // margin is fractional and exact at the boundary
    assert(Bench.recordReplaceAllowed(124.219 * 1.10, incumbent, 0.10, force = false))
  }

  test("contendedName: suffix lands before the extension") {
    assert(Bench.contendedName("BENCH_full.json") === "BENCH_full_contended.json")
    assert(Bench.contendedName("/tmp/out/BENCH_full.json") ===
      "/tmp/out/BENCH_full_contended.json")
    assert(Bench.contendedName("record") === "record_contended")
  }
}
