package graft

/** Per-query bench regression bands (round-9 VERDICT ask #1).
  *
  * Baselines are the DRIVER-context readings from `BENCH_r08.json` —
  * the first clean official run for all 22 headliners (sf0.1,
  * local[32], cache hygiene in force). The builder box runs the same
  * code 1.5–2.5× faster than the driver context (box-load variance,
  * verified round 8: 16 carried queries agree within noise), so a
  * BUILDER reading that exceeds a DRIVER baseline by `Ratio` is a real
  * plan/code regression, not environment — `graft.Bench` flags it on
  * stderr at the end of every run, catching the regression before the
  * driver's official run does.
  *
  * Band = baseline × Ratio + SlackSec. `Ratio` absorbs run-to-run
  * variance on a loaded box; `SlackSec` keeps sub-second queries from
  * tripping on JIT/GC jitter alone. Breaches are WARNINGS (stderr +
  * nonzero return from [[check]]), never a bench failure: the driver's
  * JSON contract and rc semantics are unchanged.
  *
  * Update policy: baselines move only when a new official BENCH_r{N}
  * establishes a better driver reading (note it in docs/BENCH_NOTES.md);
  * they must NOT be loosened to make a regression pass.
  */
object BenchBands {
  val Ratio = 1.25
  val SlackSec = 0.5

  /** query name → BENCH_r08.json driver seconds. */
  val baseline: Map[String, Double] = Map(
    "q1_agg" -> 1.204,
    "q5_join_inner" -> 1.669,
    "q16_rollup" -> 0.948,
    "q19_distinct_agg" -> 1.032,
    "q90_tpch_q5" -> 1.636,
    "q101_tpch_q17" -> 1.301,
    "q40_window_rank" -> 1.085,
    "q43_window_rows_frame" -> 1.609,
    "q51_knn_bruteforce" -> 0.611,
    "q218_ivfpq_rerank" -> 1.950,
    "q215_dup_spans" -> 4.503,
    "q61_dedup_minhash" -> 1.719,
    "q85_stratified_sample" -> 0.783,
    "q201_ssjoin_prefix" -> 10.206,
    "q186_span_dedup" -> 1.651,
    "q123_funnel" -> 1.069,
    "q131_kmeans_embed" -> 2.884,
    "q197_kneser_ney" -> 2.676,
    "q209_auc_eval" -> 1.996,
    "q202_pca_power" -> 4.041,
    "q211_quality_classifier" -> 2.066,
    "q73_sessionize" -> 0.920)

  def bandFor(name: String): Option[Double] =
    baseline.get(name).map(_ * Ratio + SlackSec)

  /** Flag timed queries outside their band; returns the breaches.
    * Headliners newer than BENCH_r08 have no band yet (flagged as
    * `no-band` info lines so the table is extended next official run). */
  def check(timed: Seq[(String, Double)]): Seq[String] = {
    val breaches = timed.flatMap { case (name, sec) =>
      bandFor(name) match {
        case Some(band) if sec > band =>
          System.err.println(
            f"[bands] BREACH $name: $sec%.2f s > band $band%.2f s " +
              f"(r8 driver baseline ${baseline(name)}%.2f s x $Ratio + $SlackSec)")
          Some(name)
        case None =>
          System.err.println(s"[bands] no-band $name (newer than BENCH_r08; " +
            "add its first official driver reading to BenchBands.baseline)")
          None
        case _ => None
      }
    }
    if (breaches.isEmpty)
      System.err.println(s"[bands] all ${timed.size} queries within band")
    breaches
  }
}
