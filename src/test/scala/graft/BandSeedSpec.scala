package graft

import org.scalatest.funsuite.AnyFunSuite

/** The band-seed policy as code (r16 VERDICT ask #4): bands move only
  * on adjudicated-idle official readings — a suspect-stamped record
  * must be REFUSED as a band source, and an eligible record may only
  * tighten or add bands, never loosen them. */
class BandSeedSpec extends AnyFunSuite {
  private val base = Map("q1_agg" -> 1.0, "q5_join_inner" -> 2.0)
  private val heads = Set("q1_agg", "q5_join_inner", "q_new_headliner")

  private def record(
      cpuSuspect: Boolean = false, ioSuspect: Boolean = false,
      preSuspect: Option[Boolean] = Some(false), subset: Boolean = false,
      warmupFailed: Seq[String] = Nil,
      queries: String = """"q1_agg":0.9,"q5_join_inner":2.5"""): String = {
    val sub = if (subset) """"subset":true,"nQueries":2,""" else ""
    val wf = if (warmupFailed.isEmpty) ""
      else warmupFailed.mkString(""""warmupFailed":["""", "\",\"", "\"],")
    val pre = preSuspect.map(p =>
      s""""preflight":{"cpu":0.1,"io":0.12,"suspect":$p},""").getOrElse("")
    s"""{"metric":"total","value":3.4,"unit":"sec",$sub$wf$pre""" +
      s""""sentinel":{"before":0.1,"mid":0.1,"after":0.1,"idleBaseline":0.125,"suspectLoad":$cpuSuspect,"loadElevated":false},""" +
      s""""ioSentinel":{"before":0.12,"mid":0.12,"after":0.12,"idleBaseline":0.130,"writeOnly":false,"suspectLoad":$ioSuspect,"loadElevated":false},""" +
      s""""queries":{$queries},"failed":[],"sf":"/root/testdata/sf0.1"}"""
  }

  test("clean record: tightens beaten baselines, never loosens") {
    val got = tools.BandSeed.propose(record(), base, heads, allowBare = true)
    // q1_agg 0.9 < 1.0 → tighten; q5 2.5 > 2.0 → untouched (no loosening)
    assert(got === Right(Seq("q1_agg" -> 0.9)))
  }

  test("clean record: seeds a first band for a band-less headliner only") {
    val q = """"q1_agg":1.5,"q_new_headliner":3.3,"q_not_headline":0.2"""
    val got = tools.BandSeed.propose(record(queries = q), base, heads, allowBare = true)
    assert(got === Right(Seq("q_new_headliner" -> 3.3)))
  }

  test("suspect stamps refuse: cpu, io, preflight, subset") {
    assert(tools.BandSeed.propose(record(cpuSuspect = true), base, heads, allowBare = true).isLeft)
    assert(tools.BandSeed.propose(record(ioSuspect = true), base, heads, allowBare = true).isLeft)
    assert(tools.BandSeed.propose(record(preSuspect = Some(true)), base, heads, allowBare = true).isLeft)
    assert(tools.BandSeed.propose(record(subset = true), base, heads, allowBare = true).isLeft)
    // the refusal names its cause so the operator knows what to fix
    val Left(why) = tools.BandSeed.propose(record(cpuSuspect = true), base, heads, allowBare = true)
    assert(why.contains("cpu sentinel"))
  }

  test("records without probe stamps cannot seed") {
    // pre-sentinel-era JSON (no sentinel objects at all)
    val old = """{"metric":"total","value":3.4,"queries":{"q1_agg":0.5}}"""
    assert(tools.BandSeed.propose(old, base, heads, allowBare = true).isLeft)
    // a preflight-less record with nominal sweep sentinels is still
    // eligible (r13–r16 records carry no preflight field)
    assert(tools.BandSeed.propose(record(preSuspect = None), base, heads, allowBare = true)
      === Right(Seq("q1_agg" -> 0.9)))
  }

  test("cold-state and failed readings are skipped per query") {
    val q = """"q1_agg":0.4,"q5_join_inner":null"""
    val got = tools.BandSeed.propose(
      record(warmupFailed = Seq("q1_agg"), queries = q), base, heads,
      allowBare = true)
    // q1_agg's warmup failed (cold-state, not the banded probe-only
    // shape); q5's reading is null (the query failed) — neither seeds
    assert(got === Right(Nil))
  }

  test("provenance: a bare metric line never seeds without --allow-bare") {
    // r17 live-fire lesson: the first builder-box series passed every
    // stamp check and would have tightened three bands — the r11
    // mistake r12 reverted. Only the driver wrapper form is a band
    // source; the same record INSIDE a wrapper tail is accepted.
    val bare = record()
    val got = tools.BandSeed.propose(bare, base, heads)
    assert(got.isLeft && got.swap.exists(_.contains("not an official driver record")))
    val wrapped = s"""{"n":17,"rc":0,"tail":"[info] ${bare.replace("\"", "\\\"")}\\n"}"""
    assert(tools.BandSeed.propose(wrapped, base, heads)
      === Right(Seq("q1_agg" -> 0.9)))
  }

  test("garbage input refuses instead of throwing") {
    assert(tools.BandSeed.propose("not json at all", base, heads, allowBare = true).isLeft)
    assert(tools.BandSeed.propose("[1,2,3]", base, heads, allowBare = true).isLeft)
    assert(tools.BandSeed.propose("""{"metric":"total"}""", base, heads, allowBare = true).isLeft)
  }

  test("the live r16 official record is refused (it was suspect-stamped)") {
    // the motivating case: BENCH_r16.json itself must never seed — the
    // driver wrapper form (metric line inside "tail") is unwrapped
    val p = java.nio.file.Paths.get("BENCH_r16.json")
    if (java.nio.file.Files.exists(p)) {
      val json = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val got = tools.BandSeed.propose(json)
      assert(got === Left("cpu sentinel stamped SUSPECT-LOAD during the sweep"))
    }
  }

  test("driver wrapper without a metric line refuses") {
    val crashed = """{"n":16,"rc":1,"tail":"[error] boom\n"}"""
    assert(tools.BandSeed.propose(crashed, base, heads).isLeft)
  }
}
