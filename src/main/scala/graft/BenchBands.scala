package graft

/** Per-query bench regression bands (round-9 VERDICT ask #1).
  *
  * Baselines are the best official DRIVER-context readings per query —
  * min of `BENCH_r08.json` and `BENCH_r09.json` (sf0.1, local[32],
  * cache hygiene in force). Builder-vs-driver relative speed is NOT
  * stable (round 8 measured the builder 1.5–2.5× faster; round 10
  * measured it 1.1–1.9× SLOWER on several queries under box load), so
  * a single local breach is a SIGNAL to re-run, not a verdict: treat a
  * breach as a real plan/code regression only when it repeats across
  * fresh-JVM runs (the round-10 q131 protocol, docs/BENCH_NOTES.md).
  * `graft.Bench` flags breaches on stderr at the end of every full
  * run, catching regressions before the driver's official run does.
  *
  * Band = baseline × Ratio + SlackSec. `Ratio` absorbs run-to-run
  * variance on a loaded box; `SlackSec` keeps sub-second queries from
  * tripping on JIT/GC jitter alone. Breaches are WARNINGS (stderr +
  * nonzero return from [[check]]), never a bench failure: the driver's
  * JSON contract and rc semantics are unchanged.
  *
  * Update policy: baselines are OFFICIAL DRIVER readings only — the
  * min per query across BENCH_r08..r{latest}. Builder-box fresh-JVM
  * series are diagnostic evidence for adjudicating a breach (the
  * round-10 q131 protocol), never a baseline source: builder-vs-driver
  * relative speed is not stable, so folding builder readings would
  * calibrate the band against a box the official run doesn't use
  * (round 11 briefly did this for q123/q131; reverted round 12, see
  * docs/BENCH_NOTES.md "r12 band rebase"). Baselines move only when a
  * new official BENCH_r{N} establishes a better driver reading (note
  * it in BENCH_NOTES); they must NOT be loosened to make a regression
  * pass.
  */
object BenchBands {
  val Ratio = 1.25
  val SlackSec = 0.5

  /** Idle-box median of the [[Bench.sentinelSec]] probe (this box IS
    * the official driver box; calibrated r13 from fresh-JVM idle runs,
    * see docs/BENCH_NOTES.md "r13 load sentinel"). The probe is pure
    * scheduler + CPU over an in-memory range, so engine code changes
    * cannot move it; only host load can. Recalibrate only from
    * official-run sentinel readings on an adjudicated-idle box — the
    * same official-readings-only policy the query bands follow. */
  val SentinelBaselineSec = 0.125
  val SentinelLoadRatio = 2.0

  /** A run is load-suspect when ANY sentinel checkpoint (before / mid /
    * after the sweep) inflates past the idle baseline by
    * [[SentinelLoadRatio]]. The ratio is deliberately loose (2×, not
    * the bands' 1.25×): the sentinel is sub-100 ms, so scheduler noise
    * is proportionally larger than on full queries, and a false
    * "suspect-load" stamp would un-adjudicate a REAL regression. */
  def loadSuspect(sentinel: Seq[Double]): Boolean =
    sentinel.nonEmpty && sentinel.max > SentinelBaselineSec * SentinelLoadRatio

  /** Idle-box median of [[Bench.ioSentinelSec]] (r15 VERDICT ask #2:
    * the CPU probe is blind to host IO throttling — r15's late-day
    * drift needed a prose adjudication because totals inflated while
    * the CPU sentinel sat nominal). Calibrated r16 from fresh idle
    * runs on this box (the official driver box): 32 MiB fsync write
    * ~0.10 s + 32 MiB O_DIRECT read ~0.02 s, median ~0.13 s
    * (docs/BENCH_NOTES.md "r16 io sentinel"). Same recalibration
    * policy as the CPU baseline: adjudicated-idle official runs only. */
  val IoSentinelBaselineSec = 0.130
  /** Idle baseline for a probe whose O_DIRECT READ half is unavailable
    * (r16 VERDICT ask #3): the full baseline was calibrated WITH the
    * ~0.02 s read half, so judging write-only readings against it
    * under-trips real IO load by exactly that margin. The write half
    * idles at ~0.10 s (fsync'd 32 MiB) plus temp-file churn. */
  val IoSentinelWriteOnlyBaselineSec = 0.110
  /** Looser than the CPU probe's 2×: device-level writeback collisions
    * (a checkpoint landing mid-flush of another process's dirty pages)
    * inflate single readings more than scheduler noise inflates the
    * CPU probe, and the induced-load validation measured 3–6× under a
    * genuine throttle — 2.5× splits those regimes cleanly. */
  val IoSentinelLoadRatio = 2.5

  /** The io baseline matching the probe's shape this run — see
    * [[IoSentinelWriteOnlyBaselineSec]]. */
  def ioBaselineFor(writeOnly: Boolean): Double =
    if (writeOnly) IoSentinelWriteOnlyBaselineSec else IoSentinelBaselineSec

  /** IO-side analog of [[loadSuspect]]: ANY checkpoint past the ratio
    * stamps the run. Validated r16 by re-creating the r15 drift
    * scenario under an induced direct-IO load: the IO probe trips at
    * 3–6× while the CPU probe stays nominal. `writeOnly` switches to
    * the write-only baseline when the probe's read half degraded
    * ([[Bench.ioProbeWriteOnly]]) — judged against the full baseline,
    * write-only readings would under-trip real IO load. */
  def ioLoadSuspect(ioSentinel: Seq[Double], writeOnly: Boolean = false): Boolean =
    ioSentinel.nonEmpty &&
      ioSentinel.max > ioBaselineFor(writeOnly) * IoSentinelLoadRatio

  /** Advisory sub-trip tier (r16 bench series observation): a box can
    * drift query totals ~30% while both probes sit BETWEEN 1.4× and
    * their trip ratios — enough elevation to explain breaches, not
    * enough to stamp them suspect (r16 run 1: four breaches, cpu probe
    * 1.2–1.6×, totals +34% vs the clean run an hour later on unchanged
    * code). This tier makes that state machine-visible in the stderr
    * line — "elevated (sub-trip)" — so an adjudicator reading the
    * series sees the probe evidence without recomputing ratios. It
    * never changes breach semantics or the suspect stamp: elevated is
    * ADVISORY (a real 30% regression would also not be excused by it). */
  val ElevatedRatio = 1.4
  def loadElevated(readings: Seq[Double], baseline: Double): Boolean =
    readings.nonEmpty && readings.max > baseline * ElevatedRatio

  /** query name → best official driver seconds (min of BENCH_r08–r11;
    * r11 improved q19/q40/q51/q90/q123/q131/q186 — the trainer-cache
    * fix made q131's r11 reading 2.426 vs r10's 4.18, and q123's
    * official 0.590 beats the briefly-folded builder median 0.650). */
  val baseline: Map[String, Double] = Map(
    "q1_agg" -> 0.988,
    "q5_join_inner" -> 1.398,
    "q16_rollup" -> 0.784,
    "q19_distinct_agg" -> 0.984,
    "q90_tpch_q5" -> 1.377,
    "q101_tpch_q17" -> 0.989,
    "q40_window_rank" -> 1.019,
    "q43_window_rows_frame" -> 1.479,
    "q51_knn_bruteforce" -> 0.572,
    "q218_ivfpq_rerank" -> 1.566,
    "q215_dup_spans" -> 4.071,
    "q61_dedup_minhash" -> 1.424,
    "q85_stratified_sample" -> 0.608,
    "q201_ssjoin_prefix" -> 4.542,
    "q186_span_dedup" -> 0.662,
    "q123_funnel" -> 0.590,
    "q131_kmeans_embed" -> 2.426,
    "q197_kneser_ney" -> 1.411,
    "q209_auc_eval" -> 0.846,
    "q202_pca_power" -> 1.954,
    "q211_quality_classifier" -> 0.979,
    "q73_sessionize" -> 0.580,
    // first official driver reading, BENCH_r14 (r14 VERDICT ask #1)
    "q258_crawl_capstone" -> 6.305,
    // first official driver reading, BENCH_r15 (r15 VERDICT ask #1)
    "q259_crawl_capstone_ptr" -> 6.388)

  def bandFor(name: String): Option[Double] =
    baseline.get(name).map(_ * Ratio + SlackSec)

  /** Adjudicate a post-series in-JVM re-time of a breached query (r16
    * VERDICT ask #1b — the band protocol's "a regression must repeat"
    * rule as machine evidence): Some(true) = the retry landed back in
    * band, so the breach did not repeat and is adjudicated
    * environmental by the JSON record itself; Some(false) = the breach
    * repeats in the same warm JVM — treat it as a real regression;
    * None = the query has no band (nothing to adjudicate against). */
  def retryInBand(name: String, retrySec: Double): Option[Boolean] =
    bandFor(name).map(retrySec <= _)

  /** Flag timed queries outside their band; returns the breaches.
    * Headliners newer than BENCH_r08 have no band yet (flagged as
    * `no-band` info lines so the table is extended next official run).
    * When `sentinel` readings show host-load inflation
    * ([[loadSuspect]]), each breach is stamped `suspect-load` — the
    * mechanical form of the r10–r12 prose adjudications: the probe's
    * work is code-invariant, so its inflation proves the box (not the
    * engine) slowed down. Suspect-load breaches still return as
    * breaches; the stamp tells the reader to re-run idle before
    * treating them as regressions (docs/BENCH_NOTES.md protocol).
    *
    * A query named in `warmupFailed` (its untimed state-building
    * warmup threw — see `Bench`'s benchWarmup loop) is EXCLUDED from
    * band comparison and reported as a `cold-state` line, the same
    * posture as `no-band` (r15 VERDICT ask #3): its timed region
    * rebuilt pile state that the band's baseline never pays for, so
    * scoring it red against a probe-only band would manufacture a
    * phantom regression — and folding it in green would hide a real
    * one. The reading stays in the JSON (stamped `warmupFailed`
    * there), it just cannot adjudicate a band. */
  def check(timed: Seq[(String, Double)],
      sentinel: Seq[Double] = Nil,
      warmupFailed: Set[String] = Set.empty,
      ioSentinel: Seq[Double] = Nil,
      ioWriteOnly: Boolean = false): Seq[String] = {
    // EITHER probe tripping stamps the run: CPU steal and IO throttle
    // are independent host-side failure modes and each alone inflates
    // query totals (r15's drift was IO-only — CPU probe nominal)
    val suspect = loadSuspect(sentinel) || ioLoadSuspect(ioSentinel, ioWriteOnly)
    def verdict(suspectNow: Boolean, readings: Seq[Double], baseline: Double,
        tag: String): String =
      if (suspectNow) s"SUSPECT-LOAD ($tag)"
      else if (loadElevated(readings, baseline)) s"$tag load elevated (sub-trip)"
      else s"$tag load nominal"
    if (sentinel.nonEmpty)
      System.err.println(f"[bands] sentinel ${sentinel.map(s => f"$s%.3f").mkString("/")} s " +
        f"vs idle baseline $SentinelBaselineSec%.3f s → " +
        verdict(loadSuspect(sentinel), sentinel, SentinelBaselineSec, "cpu"))
    if (ioSentinel.nonEmpty) {
      val ioBase = ioBaselineFor(ioWriteOnly)
      val woMark = if (ioWriteOnly) " (WRITE-ONLY probe)" else ""
      System.err.println(f"[bands] io-sentinel ${ioSentinel.map(s => f"$s%.3f").mkString("/")} s " +
        f"vs idle baseline $ioBase%.3f s$woMark → " +
        verdict(ioLoadSuspect(ioSentinel, ioWriteOnly), ioSentinel, ioBase, "io"))
    }
    val breaches = timed.flatMap { case (name, sec) =>
      bandFor(name) match {
        case _ if warmupFailed(name) =>
          System.err.println(f"[bands] cold-state $name: $sec%.2f s excluded " +
            "from band comparison (state-building warmup failed, so the " +
            "timed region rebuilt pile state the band's probe-only " +
            "baseline never pays; re-run with a healthy warmup)")
          None
        case Some(band) if sec > band =>
          val stamp = if (suspect) " [suspect-load: sentinel inflated, re-run idle]" else ""
          System.err.println(
            f"[bands] BREACH $name: $sec%.2f s > band $band%.2f s " +
              f"(driver baseline ${baseline(name)}%.2f s x $Ratio + $SlackSec)$stamp")
          Some(name)
        case None =>
          System.err.println(s"[bands] no-band $name (no official driver " +
            "reading yet; add its first one to BenchBands.baseline)")
          None
        case _ => None
      }
    }
    if (breaches.isEmpty) {
      val excluded = timed.count { case (n, _) => warmupFailed(n) }
      if (excluded == 0)
        System.err.println(s"[bands] all ${timed.size} queries within band")
      else
        System.err.println(s"[bands] ${timed.size - excluded} of ${timed.size} " +
          s"queries within band ($excluded cold-state, excluded)")
    }
    breaches
  }
}
