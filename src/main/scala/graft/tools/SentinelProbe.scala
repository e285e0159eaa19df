package graft.tools

/** Standalone two-probe load-sentinel sweep (r15 VERDICT ask #2's
  * validation + calibration harness): prints N (cpuSec, ioSec) reading
  * pairs from the exact probes `graft.Bench` samples at its
  * checkpoints, then the machine verdicts [[graft.BenchBands.loadSuspect]]
  * and [[graft.BenchBands.ioLoadSuspect]] would stamp a bench run with.
  *
  * Uses: (a) re-adjudicating a band breach — run this on the suspect
  * box and read the verdict instead of writing prose (the r15
  * "late-day drift" scenario, where query totals inflated 43.5→51 s
  * on unchanged code while the CPU-only sentinel sat nominal); (b)
  * recalibrating idle baselines from an adjudicated-idle box; (c) the
  * induced-load validation recorded in docs/BENCH_NOTES.md "r16 io
  * sentinel" (direct-IO writers trip the io verdict 3–6× past
  * baseline while the cpu verdict stays nominal).
  *
  * Usage: runMain graft.tools.SentinelProbe [n=3]
  */
object SentinelProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same settling discipline as Bench: fresh-JVM first executions of
    // the probe shapes read ~2x their steady cost
    (0 until 3).foreach(_ => graft.Bench.sentinelSec(spark))
    graft.Bench.ioSentinelSec()
    val readings = (0 until n).map { i =>
      val c = graft.Bench.sentinelSec(spark)
      val io = graft.Bench.ioSentinelSec()
      println(f"""{"i":$i,"cpuSec":$c%.3f,"ioSec":$io%.3f}""")
      (c, io)
    }
    println(f"""{"cpuIdleBaseline":${graft.BenchBands.SentinelBaselineSec}%.3f,""" +
      f""""ioIdleBaseline":${graft.BenchBands.IoSentinelBaselineSec}%.3f,""" +
      s""""cpuSuspect":${graft.BenchBands.loadSuspect(readings.map(_._1))},""" +
      s""""ioSuspect":${graft.BenchBands.ioLoadSuspect(readings.map(_._2))}}""")
    spark.stop()
  }
}
