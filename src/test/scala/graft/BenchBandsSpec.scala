package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench-regression-band table (round-9 VERDICT ask #1):
  * every banded query must still be a headliner (a renamed/dropped
  * headliner would silently lose its regression check), bands must be
  * sane, and the check must flag exactly the out-of-band queries. */
class BenchBandsSpec extends AnyFunSuite {

  test("every banded query is a current headline query") {
    val headliners = SparkEntry.benchNames.toSet
    val orphans = BenchBands.baseline.keySet -- headliners
    assert(orphans.isEmpty,
      s"banded but no longer headline: ${orphans.mkString(", ")}")
  }

  test("every BENCH_r08-era headliner has a band") {
    // All 22 r8 headliners are banded; only queries promoted to
    // headline AFTER r8 may be temporarily band-less.
    assert(BenchBands.baseline.size >= 22)
    BenchBands.baseline.values.foreach(v => assert(v > 0.0))
  }

  test("band math: baseline*ratio+slack, breaches flagged exactly") {
    val name = "q1_agg"
    val band = BenchBands.bandFor(name).get
    // Derive the expectation from the live baseline map — round 10
    // shipped red because this line pinned a pre-rebase literal.
    val base = BenchBands.baseline(name)
    assert(math.abs(band - (base * BenchBands.Ratio + BenchBands.SlackSec)) < 1e-9)
    assert(BenchBands.check(Seq(name -> (band - 0.01))).isEmpty)
    assert(BenchBands.check(Seq(name -> (band + 0.01))) === Seq(name))
    // unknown query → no breach (flagged as no-band, not failed)
    assert(BenchBands.check(Seq("q_new_headliner" -> 99.0)).isEmpty)
  }

  test("warmup-failed readings are excluded from band comparison (cold-state, not red)") {
    // r15 VERDICT ask #3: a headliner whose state-building warmup
    // failed rebuilds its piles INSIDE the timed region — comparing
    // that reading against its probe-only band would breach "red" on a
    // phantom regression. The stamp must exclude it, and must not
    // shadow genuine breaches of other queries in the same run.
    val name = "q258_crawl_capstone"
    val band = BenchBands.bandFor(name).get
    // out-of-band reading + warmupFailed → excluded, no breach
    assert(BenchBands.check(Seq(name -> (band * 3)), Nil, Set(name)).isEmpty)
    // the exclusion is per-query: a second query's real breach survives
    val other = "q1_agg"
    val otherBand = BenchBands.bandFor(other).get
    assert(BenchBands.check(Seq(name -> (band * 3), other -> (otherBand + 0.01)),
      Nil, Set(name)) === Seq(other))
    // and a healthy run is unaffected by an empty warmupFailed set
    assert(BenchBands.check(Seq(name -> (band - 0.01)), Nil, Set.empty).isEmpty)
  }

  test("io sentinel: inflated readings mark the run suspect-load independently of the cpu probe") {
    // r15 VERDICT ask #2: host IO throttling inflated query totals
    // while the CPU probe sat nominal — the IO probe must stamp that
    // run mechanically, with its own baseline and (looser) trip ratio.
    val idleCpu = BenchBands.SentinelBaselineSec
    val idleIo = BenchBands.IoSentinelBaselineSec
    assert(!BenchBands.ioLoadSuspect(Seq(idleIo, idleIo * 2.0, idleIo)))
    assert(BenchBands.ioLoadSuspect(Seq(idleIo, idleIo * 3.0, idleIo)))
    assert(!BenchBands.ioLoadSuspect(Nil)) // older JSON / subset runs
    // the r15 scenario: cpu nominal, io tripped → breach is still
    // returned but the run is stamped suspect (stderr); and a clean io
    // probe changes nothing
    val name = "q1_agg"
    val band = BenchBands.bandFor(name).get
    assert(BenchBands.check(Seq(name -> (band + 0.01)),
      Seq(idleCpu), Set.empty, Seq(idleIo * 4)) === Seq(name))
    assert(BenchBands.check(Seq(name -> (band - 0.01)),
      Seq(idleCpu), Set.empty, Seq(idleIo)).isEmpty)
  }

  test("elevated tier: sub-trip inflation is advisory only") {
    // r16 run-1 pattern: breaches on a run whose probes sit between
    // 1.4x and their trip ratios — the elevated tier surfaces that in
    // the stderr verdict but never changes breach or suspect semantics
    val idle = BenchBands.SentinelBaselineSec
    assert(BenchBands.loadElevated(Seq(idle * 1.5), idle))
    assert(!BenchBands.loadElevated(Seq(idle * 1.3), idle))
    assert(!BenchBands.loadElevated(Nil, idle))
    // elevated is NOT suspect: the breach still returns un-stamped
    val name = "q1_agg"
    val band = BenchBands.bandFor(name).get
    assert(!BenchBands.loadSuspect(Seq(idle * 1.5)))
    assert(BenchBands.check(Seq(name -> (band + 0.01)),
      Seq(idle * 1.5)) === Seq(name))
  }

  test("retry adjudication: in-band retry labels the breach non-repeating, a repeat confirms it") {
    // r16 VERDICT ask #1b: the "a regression must repeat" protocol as
    // machine evidence — Bench re-times each breached query once and
    // stamps retryInBand's verdict into the metric JSON.
    val name = "q1_agg"
    val band = BenchBands.bandFor(name).get
    // retry lands back in band → non-repeating, adjudicated environmental
    assert(BenchBands.retryInBand(name, band - 0.01) === Some(true))
    // retry breaches again in the same JVM → treat as a real regression
    assert(BenchBands.retryInBand(name, band + 0.01) === Some(false))
    // a band-less headliner has nothing to adjudicate against
    assert(BenchBands.retryInBand("q_new_headliner", 1.0) === None)
  }

  test("write-only io probe switches to the write-only baseline") {
    // r16 VERDICT ask #3: a probe whose O_DIRECT read half degraded
    // reads ~0.02 s low — judged against the full two-sided baseline it
    // would under-trip real IO load. The write-only baseline restores
    // trip sensitivity, and the flag rides the check into the verdict.
    val full = BenchBands.IoSentinelBaselineSec
    val wo = BenchBands.IoSentinelWriteOnlyBaselineSec
    assert(wo < full) // the read half's contribution is gone
    assert(BenchBands.ioBaselineFor(writeOnly = true) === wo)
    assert(BenchBands.ioBaselineFor(writeOnly = false) === full)
    // a reading just past the write-only trip but under the full trip:
    // suspect ONLY when the probe is known write-only
    val reading = wo * BenchBands.IoSentinelLoadRatio + 0.01
    assert(reading < full * BenchBands.IoSentinelLoadRatio)
    assert(BenchBands.ioLoadSuspect(Seq(reading), writeOnly = true))
    assert(!BenchBands.ioLoadSuspect(Seq(reading), writeOnly = false))
  }

  test("O_DIRECT read pass: expected unavailability degrades, never throws") {
    // r16 VERDICT ask #3 / ADVICE #1: the narrowed catch — a missing
    // probe file is an IOException (NoSuchFileException) and must
    // return false rather than abort the bench...
    val missing = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft-iosentinel-definitely-absent.bin")
    assert(!Bench.directReadPass(missing))
    // ...while a healthy aligned file reads fine through O_DIRECT on
    // this box (512-byte multiple — O_DIRECT needs aligned lengths)
    val f = java.nio.file.Files.createTempFile("graft-iosent-spec", ".bin")
    try {
      java.nio.file.Files.write(f, new Array[Byte](4096))
      assert(Bench.directReadPass(f))
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("load sentinel: inflated readings mark the run suspect-load") {
    val idle = BenchBands.SentinelBaselineSec
    // nominal: every checkpoint under the loose 2x ratio
    assert(!BenchBands.loadSuspect(Seq(idle, idle * 1.5, idle)))
    // ANY checkpoint past the ratio taints the run (mid-sweep throttle
    // is exactly the r10-r12 pattern)
    assert(BenchBands.loadSuspect(Seq(idle, idle * 2.5, idle)))
    // no sentinel (older JSON / subset runs) → never suspect
    assert(!BenchBands.loadSuspect(Nil))
    // a breach under load is still RETURNED as a breach (the stamp is
    // advisory; the bands' contract to the driver is unchanged)
    val name = "q1_agg"
    val band = BenchBands.bandFor(name).get
    assert(BenchBands.check(Seq(name -> (band + 0.01)),
      Seq(idle * 3)) === Seq(name))
    assert(BenchBands.check(Seq(name -> (band - 0.01)),
      Seq(idle * 3)).isEmpty)
  }
}
