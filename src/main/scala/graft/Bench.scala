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

  /** IO-side load sentinel (r15 VERDICT ask #2): the CPU sentinel above
    * is blind to HOST IO THROTTLING — r15's late-day drift inflated
    * query totals 43.5→51 s while the pure-CPU probe sat nominal,
    * forcing a prose adjudication the r13 sentinel was built to end.
    * One probe pass = a 32 MiB fsync'd write of fixed bytes to a fresh
    * temp file (the write path shuffle spills take) + a 32 MiB
    * O_DIRECT read of a fixed probe file (the uncached-read path
    * parquet scans take) — both on the same single ext4 device
    * (/dev/vda) every bench read, spill, and pile write uses on this
    * box. fsync and O_DIRECT are the point: a page-cached re-scan of a
    * checked-in file never reaches the block layer, so it cannot see a
    * cgroup/host IO limit at all (measured: induced direct-IO load
    * inflates this probe 3–6× while leaving cached reads flat —
    * docs/BENCH_NOTES.md "r16 io sentinel"). Engine code changes
    * cannot move it; only the device can. Median of 3 passes
    * (~0.4 s/checkpoint) so one writeback collision can't fake load.
    * If O_DIRECT is unsupported the read half contributes 0 and the
    * write half still instruments the device (writeback is charged at
    * fsync regardless). */
  def ioSentinelSec(): Double = {
    val block = new Array[Byte](1 << 20)
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < block.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      block(i) = x.toByte; i += 1
    }
    import java.nio.file.{Files, Paths, StandardOpenOption}
    import java.nio.channels.FileChannel
    val dir = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val fixed = dir.resolve("graft-iosentinel-fixed.bin")
    if (!Files.exists(fixed) || Files.size(fixed) != (32L << 20)) {
      val ch = FileChannel.open(fixed, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
      try {
        (0 until 32).foreach(_ => ch.write(java.nio.ByteBuffer.wrap(block)))
        ch.force(true)
      } finally ch.close()
    }
    val runs = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      val f = Files.createTempFile(dir, "graft-iosent", ".bin")
      val wch = FileChannel.open(f, StandardOpenOption.WRITE)
      try {
        (0 until 32).foreach(_ => wch.write(java.nio.ByteBuffer.wrap(block)))
        wch.force(true)
      } finally { wch.close(); Files.deleteIfExists(f) }
      try {
        val buf = java.nio.ByteBuffer.allocateDirect((1 << 20) + 4096)
          .alignedSlice(4096)
        val rch = FileChannel.open(fixed, StandardOpenOption.READ,
          com.sun.nio.file.ExtendedOpenOption.DIRECT)
        try {
          var pos = 0L
          val sz = rch.size()
          while (pos < sz) {
            buf.clear()
            val r = rch.read(buf, pos)
            if (r < 0) pos = sz else pos += r
          }
        } finally rch.close()
      } catch { case _: Throwable => () } // unsupported FS: write-only probe
      (System.nanoTime() - t0) / 1e9
    }.sorted
    runs(1)
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
    // first IO-sentinel call creates the fixed O_DIRECT probe file (a
    // one-off 32 MiB write) — discard it so the cost lands outside the
    // checkpoints, like the CPU sentinel's JIT-settling passes above
    ioSentinelSec()
    val sentBefore = sentinelSec(spark)
    val ioBefore = ioSentinelSec()
    val half = names.size / 2
    var sentMid = -1.0
    var ioMid = -1.0
    val timed = names.zipWithIndex.map { case (name, i) =>
      if (i == half) { sentMid = sentinelSec(spark); ioMid = ioSentinelSec() }
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
    val ioAfter = ioSentinelSec()
    if (sentMid < 0) sentMid = sentAfter // degenerate: < 2 queries
    if (ioMid < 0) ioMid = ioAfter
    val sentinel = Seq(sentBefore, sentMid, sentAfter)
    val ioSentinel = Seq(ioBefore, ioMid, ioAfter)
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
      // warmup-failed headliners are excluded from band comparison
      // (stamped cold-state, r15 VERDICT ask #3): their timed region
      // rebuilt state the probe-only band never pays for
      BenchBands.check(timed.collect { case (k, v, true) => (k, v) }, sentinel,
        warmupFailed.toSet, ioSentinel)
    // "subset":true marks a partial run so its total can never be
    // mistaken for an official 22-headliner reading.
    val subsetMark = if (subset) s""""subset":true,"nQueries":${names.size},""" else ""
    val warmupMark =
      if (warmupFailed.isEmpty) ""
      else warmupFailed.map("\"" + _ + "\"").mkString(""""warmupFailed":[""", ",", "],")
    val sentJson = f""""sentinel":{"before":$sentBefore%.3f,"mid":$sentMid%.3f,""" +
      f""""after":$sentAfter%.3f,"idleBaseline":${BenchBands.SentinelBaselineSec}%.3f,""" +
      s""""suspectLoad":${BenchBands.loadSuspect(sentinel)}},""" +
      f""""ioSentinel":{"before":$ioBefore%.3f,"mid":$ioMid%.3f,""" +
      f""""after":$ioAfter%.3f,"idleBaseline":${BenchBands.IoSentinelBaselineSec}%.3f,""" +
      s""""suspectLoad":${BenchBands.ioLoadSuspect(ioSentinel)}},"""
    println(s"""{"metric":"total","value":$total,"unit":"sec",$subsetMark$warmupMark$sentJson"queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (timed.exists(!_._3)) sys.exit(1)
  }
}
