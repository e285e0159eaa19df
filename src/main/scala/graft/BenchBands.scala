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
    "q258_crawl_capstone" -> 6.305)

  def bandFor(name: String): Option[Double] =
    baseline.get(name).map(_ * Ratio + SlackSec)

  /** Flag timed queries outside their band; returns the breaches.
    * Headliners newer than BENCH_r08 have no band yet (flagged as
    * `no-band` info lines so the table is extended next official run).
    * When `sentinel` readings show host-load inflation
    * ([[loadSuspect]]), each breach is stamped `suspect-load` — the
    * mechanical form of the r10–r12 prose adjudications: the probe's
    * work is code-invariant, so its inflation proves the box (not the
    * engine) slowed down. Suspect-load breaches still return as
    * breaches; the stamp tells the reader to re-run idle before
    * treating them as regressions (docs/BENCH_NOTES.md protocol). */
  def check(timed: Seq[(String, Double)],
      sentinel: Seq[Double] = Nil): Seq[String] = {
    val suspect = loadSuspect(sentinel)
    if (sentinel.nonEmpty)
      System.err.println(f"[bands] sentinel ${sentinel.map(s => f"$s%.3f").mkString("/")} s " +
        f"vs idle baseline $SentinelBaselineSec%.3f s → " +
        (if (suspect) "SUSPECT-LOAD run" else "load nominal"))
    val breaches = timed.flatMap { case (name, sec) =>
      bandFor(name) match {
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
    if (breaches.isEmpty)
      System.err.println(s"[bands] all ${timed.size} queries within band")
    breaches
  }
}
