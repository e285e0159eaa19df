package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Spill-path proof (round-9 VERDICT ask #4): run a query subset under
  * a constrained heap (the harness passes `-Xmx2g` via run/javaOptions)
  * against scaled data and record per-query
  * `memoryBytesSpilled`/`diskBytesSpilled` from task metrics — nonzero
  * spill proves the EXTERNAL sort/aggregation/join paths actually
  * engaged (matching the reference's spill posture:
  * `/root/reference/dbms/src/Interpreters/Aggregator.cpp:1268`,
  * `HashJoinSpillContext.h`), while the parquet dump feeds
  * `tools/check_oracle.py` so the under-pressure results are
  * hash-verified unchanged, not just "didn't crash".
  *
  * Usage: runMain graft.tools.SpillProof <sfDir> <outDir> <q1,q2,...>
  * Prints one JSON line per query:
  *   {"query":...,"sec":...,"memSpilledBytes":...,"diskSpilledBytes":...}
  */
object SpillProof {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, namesS) = args.take(3)
    val names = namesS.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val mem = new AtomicLong(0L)
    val disk = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          mem.addAndGet(m.memoryBytesSpilled)
          disk.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    println(s"""{"heapMaxBytes":${Runtime.getRuntime.maxMemory}}""")
    names.foreach { name =>
      mem.set(0L); disk.set(0L)
      val t0 = System.nanoTime()
      val ok =
        try {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[spill] $name FAILED: $e"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      graft.CacheHygiene.sweep(spark, name)
      // listener events are posted asynchronously (and the bus is
      // private[spark], so no waitUntilEmpty): the job is complete when
      // write() returns, so a short settle covers the posting lag
      Thread.sleep(1000)
      println(f"""{"query":"$name","ok":$ok,"sec":$sec%.2f,""" +
        s""""memSpilledBytes":${mem.get},"diskSpilledBytes":${disk.get}}""")
    }
    spark.stop()
  }
}
