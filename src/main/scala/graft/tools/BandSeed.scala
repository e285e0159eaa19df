package graft.tools

import scala.jdk.CollectionConverters._

/** Band-seed policy as code (r16 VERDICT ask #4): baselines in
  * [[graft.BenchBands.baseline]] move ONLY on official driver
  * readings, and a suspect-stamped official reading must never seed
  * or tighten a band — BENCH_r16 itself was machine-stamped
  * SUSPECT-LOAD, and folding its inflated numbers in as "baselines"
  * would have loosened every band by ~1.5×. Until now that policy
  * lived in BenchBands' scaladoc and BENCH_NOTES prose; this tool is
  * its executable form: it ingests a `BENCH_r{N}.json` metric line,
  * REFUSES any reading the machine stamps cast doubt on, and prints
  * the baseline-map diff to apply (additions for band-less headliners,
  * tightenings where the official reading beats the stored baseline —
  * never loosenings: a slower official reading is jitter or a
  * regression, and either way the band stays).
  *
  * Refusal classes, all machine-checkable from the JSON alone:
  *  - `sentinel.suspectLoad` / `ioSentinel.suspectLoad` — a probe
  *    tripped during the sweep;
  *  - `preflight.suspect` — the box was degraded before any query ran;
  *  - `subset:true` — partial runs are scale-proof diagnostics, not
  *    official series;
  *  - missing probe stamps — a record that cannot prove idleness
  *    cannot seed (pre-r13 JSONs and hand-built lines);
  *  - per-query: `warmupFailed` names are skipped (cold-state reading,
  *    not the probe-only shape the band prices), as are failed (null)
  *    readings.
  *  - `retries` values are NEVER read (r17 VERDICT ask #8): a retry is
  *    a same-JVM breach adjudication aid, taken warm and immediately
  *    after a band breach — not an official series reading. Its
  *    `sentinelAt` stamp (one CPU-probe reading taken right after the
  *    retry) exists so a still-breached retry on a degraded box is
  *    machine-labeled suspect in the record itself; seeds come from
  *    the `queries` block alone.
  *
  * Provenance (that the file IS an official driver reading, not a
  * builder-box series) stays with the operator — the tool codifies
  * every check the JSON can carry.
  *
  * Usage: runMain graft.tools.BandSeed <BENCH_rN.json path>
  */
object BandSeed {

  /** Parse + adjudicate one metric JSON record. Left(reason) = the
    * reading is refused as a band source; Right(diffs) = the
    * (query, newBaselineSec) entries to apply to BenchBands.baseline
    * (possibly empty: a clean run that beats nothing moves nothing).
    *
    * Provenance is mechanical too (r17, live-fire lesson: the first
    * builder-box series passed every stamp check and would have
    * tightened three bands — exactly the r11 mistake r12 reverted):
    * by default only the DRIVER WRAPPER form (`BENCH_r{N}.json`, the
    * metric line inside "tail") is accepted; a bare metric line is a
    * builder/diagnostic run by construction — the driver never emits
    * one as a round artifact — and is refused unless `allowBare`
    * (the stamp-logic test seam / explicit --allow-bare override). */
  def propose(json: String,
      currentBaseline: Map[String, Double] = graft.BenchBands.baseline,
      headliners: Set[String] = graft.SparkEntry.benchNames.toSet,
      allowBare: Boolean = false)
      : Either[String, Seq[(String, Double)]] = {
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      catch { case e: java.io.IOException =>
        return Left(s"unparseable metric JSON: $e") }
    if (root == null || !root.isObject)
      return Left("unparseable metric JSON: not an object")
    // the driver's BENCH_r{N}.json wraps the metric line inside a
    // "tail" string (sbt output, [info]-prefixed) — unwrap the LAST
    // metric line and adjudicate it; a record whose tail carries no
    // metric line (rc != 0 crash) has nothing to seed from
    if (!root.has("queries") && root.has("tail")) {
      val lines = root.path("tail").asText("").split('\n')
        .filter(_.contains("\"metric\":"))
      return lines.lastOption match {
        case Some(l) if l.indexOf('{') >= 0 =>
          propose(l.substring(l.indexOf('{')), currentBaseline, headliners,
            allowBare = true) // unwrapped FROM the wrapper: provenance held
        case _ => Left("driver wrapper carries no metric line in its tail " +
          "(the bench run likely crashed)")
      }
    }
    if (root.has("queries") && !allowBare)
      return Left("bare metric line — not an official driver record (the " +
        "driver's round artifact is the BENCH_r{N}.json wrapper); builder-" +
        "box readings never seed bands (BenchBands update policy, r12 " +
        "rebase lesson). Pass --allow-bare only for diagnostics")
    if (root.path("subset").asBoolean(false))
      return Left("subset run (scale-proof diagnostic, not an official series)")
    val sent = root.path("sentinel")
    val io = root.path("ioSentinel")
    if (!sent.isObject || !sent.has("suspectLoad"))
      return Left("no cpu-sentinel stamp — a record that cannot prove " +
        "idleness cannot seed a band")
    if (!io.isObject || !io.has("suspectLoad"))
      return Left("no io-sentinel stamp — a record that cannot prove " +
        "idleness cannot seed a band")
    if (sent.path("suspectLoad").asBoolean(false))
      return Left("cpu sentinel stamped SUSPECT-LOAD during the sweep")
    if (io.path("suspectLoad").asBoolean(false))
      return Left("io sentinel stamped SUSPECT-LOAD during the sweep")
    val pre = root.path("preflight")
    if (pre.isObject && pre.path("suspect").asBoolean(false))
      return Left("preflight stamped SUSPECT-LOAD (box degraded before any query ran)")
    val queries = root.path("queries")
    if (!queries.isObject) return Left("no \"queries\" object in the record")
    val coldState = root.path("warmupFailed") match {
      case a if a.isArray => a.elements().asScala.map(_.asText()).toSet
      case _ => Set.empty[String]
    }
    val diffs = queries.fields().asScala.flatMap { e =>
      val (name, v) = (e.getKey, e.getValue)
      if (v.isNull || !v.isNumber) None // failed query: no reading
      else if (coldState(name)) None // cold-state: not the banded shape
      else {
        val sec = v.asDouble()
        currentBaseline.get(name) match {
          case Some(b) if sec < b => Some(name -> sec) // tighten
          case Some(_) => None // slower than baseline: bands never loosen
          case None if headliners(name) => Some(name -> sec) // first band
          case None => None // not a headliner: never banded
        }
      }
    }.toSeq.sortBy(_._1)
    Right(diffs)
  }

  def main(args: Array[String]): Unit = {
    val allowBare = args.contains("--allow-bare")
    val path = args.filterNot(_.startsWith("--")).headOption.getOrElse {
      System.err.println("usage: BandSeed <BENCH_rN.json> [--allow-bare]")
      sys.exit(2)
    }
    val json = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    propose(json, allowBare = allowBare) match {
      case Left(reason) =>
        System.err.println(s"[bandseed] REFUSED $path: $reason")
        System.err.println("[bandseed] bands move only on adjudicated-idle " +
          "official readings (BenchBands update policy); re-run the bench " +
          "on an idle box or wait for the next official series")
        sys.exit(1)
      case Right(Nil) =>
        println(s"[bandseed] $path is seed-eligible but beats no stored " +
          "baseline and adds no band — nothing to apply")
      case Right(diffs) =>
        println(s"[bandseed] $path is seed-eligible; apply to " +
          "BenchBands.baseline (and note the source round in BENCH_NOTES):")
        diffs.foreach { case (n, s) =>
          val verb = if (graft.BenchBands.baseline.contains(n)) "tighten" else "seed"
          println(f""""$n" -> $s%.3f, // $verb""")
        }
    }
  }
}
