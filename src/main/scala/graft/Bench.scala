package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Load sentinel (r12 VERDICT ask #4): a FIXED trivial probe — q1's
    * shape over an in-memory range, no IO, no cache — timed before,
    * mid, and after the sweep. Its cost is pure task scheduling + CPU,
    * so host contention inflates it roughly linearly while code
    * changes to the engine cannot move it at all; BenchBands compares
    * the run's sentinel readings against the idle-box baseline and
    * annotates band breaches as suspect-load instead of leaving the
    * adjudication to prose (the r10–r12 throttle pattern). Median of 5
    * runs per checkpoint so one GC pause can't fake a load signal. */
  def sentinelSec(spark: SparkSession): Double = {
    val runs = (0 until 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(100000)
        .selectExpr("id % 7 as k", "id % 13 as v")
        .groupBy("k").sum("v")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    runs(2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: JVM/codegen/parquet-footer costs land here, not on the
    // first timed query.
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    // warm the sentinel's own codegen/JIT path too: fresh-JVM first
    // executions of its shape read ~2x the settled cost (~0.24 vs
    // ~0.12 s measured), which would stamp every run suspect-load at
    // the before-checkpoint; three discarded passes settle it
    (0 until 3).foreach(_ => sentinelSec(spark))
    CacheHygiene.sweep(spark, "warmup")
    // Headline queries; noop write forces full materialization (a bare
    // count() would let Catalyst prune the computed columns away).
    // After each query, sweep any cache it left behind (outside the
    // timed region) — cache hygiene is a per-query invariant, so one
    // operator's leak can never inflate the queries that follow it.
    // Optional subset (scale-proof runs time a handful of headliners at
    // 10x/100x without paying for the full suite); full run by default.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES").exists(_.trim.nonEmpty)
    val names =
      if (subset) {
        val want = sys.env("SPARK_GRAFT_QUERIES")
          .split(",").map(_.trim).filter(_.nonEmpty)
        val known = SparkEntry.queries.keySet
        want.filterNot(known).foreach(q =>
          System.err.println(s"[bench] unknown query in SPARK_GRAFT_QUERIES: $q"))
        want.filter(known).toSeq
      } else SparkEntry.benchNames
    // Per-query untimed warmups (QueryDef.benchWarmup): state a live
    // pipeline maintains incrementally (q258's piles) is built here so
    // the timed region measures the probe — the production shape — not
    // one-off state construction.
    val defsByName = SparkEntry.defs.map(q => q.name -> q).toMap
    // A warmup failure is recorded in the emitted metric line (ADVICE
    // r14 #3): the timed run would then rebuild the state COLD inside
    // its timed region (pileCache retries), so the reading no longer
    // measures the probe-only production shape — without a machine-
    // readable stamp that number would silently enter the band series.
    val warmupFailed = scala.collection.mutable.ListBuffer[String]()
    names.flatMap(defsByName.get).foreach { q =>
      q.benchWarmup.foreach { w =>
        System.err.println(s"[bench] warmup ${q.name}")
        try w(spark, sfDir)
        catch { case e: Throwable =>
          warmupFailed += q.name
          System.err.println(s"[bench] warmup ${q.name}: $e") }
        CacheHygiene.sweep(spark, s"warmup-${q.name}")
      }
    }
    val sentBefore = sentinelSec(spark)
    val half = names.size / 2
    var sentMid = -1.0
    val timed = names.zipWithIndex.map { case (name, i) =>
      if (i == half) sentMid = sentinelSec(spark)
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      CacheHygiene.sweep(spark, name)
      (name, elapsed, ok)
    }
    val sentAfter = sentinelSec(spark)
    if (sentMid < 0) sentMid = sentAfter // degenerate: < 2 queries
    val sentinel = Seq(sentBefore, sentMid, sentAfter)
    // Failed queries report null (not their near-zero failure-path
    // elapsed) and are listed in "failed"; rc is nonzero on any failure.
    val qs = timed.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v.toString else "null")
    }.mkString("{", ",", "}")
    val failed = timed.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = timed.collect { case (_, v, true) => v }.sum
    // Regression bands (stderr-only; the driver JSON contract is
    // unchanged and band breaches never fail the bench). Subset runs
    // skip the band check: scale-proof subsets run at other SFs/configs
    // and their no-band hints for non-headliners would only mislead.
    if (sfDir.endsWith("sf0.1") && !subset)
      BenchBands.check(timed.collect { case (k, v, true) => (k, v) }, sentinel)
    // "subset":true marks a partial run so its total can never be
    // mistaken for an official 22-headliner reading.
    val subsetMark = if (subset) s""""subset":true,"nQueries":${names.size},""" else ""
    val warmupMark =
      if (warmupFailed.isEmpty) ""
      else warmupFailed.map("\"" + _ + "\"").mkString(""""warmupFailed":[""", ",", "],")
    val sentJson = f""""sentinel":{"before":$sentBefore%.3f,"mid":$sentMid%.3f,""" +
      f""""after":$sentAfter%.3f,"idleBaseline":${BenchBands.SentinelBaselineSec}%.3f,""" +
      s""""suspectLoad":${BenchBands.loadSuspect(sentinel)}},"""
    println(s"""{"metric":"total","value":$total,"unit":"sec",$subsetMark$warmupMark$sentJson"queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (timed.exists(!_._3)) sys.exit(1)
  }
}
