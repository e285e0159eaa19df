package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.{CacheHygiene, GraftSession, SparkEntry}

/** Optimization-round diagnostic (guide §1/§7): time ONE query's noop
  * materialization and attribute wall/CPU to physical STAGES, printing
  * each stage's call site so hot code paths are identifiable without
  * the (disabled) Spark UI. Usage:
  *   sbt "runMain graft.tools.StageProfile /root/testdata/sf0.1 q215_dup_spans[,q201_...]"
  * Runs each query once untimed (warmup: JIT/codegen/footers), then
  * once profiled. Reads SPARK_GRAFT_CPUS like Bench (default 32). */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q215_dup_spans"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val defsByName = SparkEntry.defs.map(q => q.name -> q).toMap

    final case class St(id: Int, name: String, tasks: Int, wallMs: Long,
        runMs: Long, cpuMs: Long, gcMs: Long, shufReadMB: Double,
        shufWriteMB: Double, spillMB: Double, rows: Long)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.name, si.numTasks,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            m.executorRunTime, m.executorCpuTime / 1000000,
            m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1048576.0,
            m.shuffleWriteMetrics.bytesWritten / 1048576.0,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576.0,
            m.outputMetrics.recordsWritten)
        }
      }
    }

    names.foreach { name =>
      val q = defsByName(name)
      q.benchWarmup.foreach { w => w(spark, sfDir); CacheHygiene.sweep(spark, s"wu-$name") }
      // untimed warmup run (codegen/JIT/footers — the Bench discipline)
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      CacheHygiene.sweep(spark, s"w-$name")
      stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      CacheHygiene.sweep(spark, name)
      val snap = stages.synchronized(stages.sortBy(-_.runMs).toVector)
      println(f"==== $name: $sec%.3f s, ${snap.size} stages, " +
        f"wall-sum ${snap.map(_.wallMs).sum / 1000.0}%.2f s, " +
        f"run-sum ${snap.map(_.runMs).sum / 1000.0}%.2f s (32-way) ====")
      snap.take(25).foreach { s =>
        println(f"  [${s.id}%4d] wall ${s.wallMs / 1000.0}%6.2f run ${s.runMs / 1000.0}%7.2f " +
          f"cpu ${s.cpuMs / 1000.0}%7.2f gc ${s.gcMs / 1000.0}%5.2f t=${s.tasks}%3d " +
          f"sr ${s.shufReadMB}%7.1fMB sw ${s.shufWriteMB}%7.1fMB sp ${s.spillMB}%6.1fMB  ${s.name.take(110)}")
      }
    }
    spark.stop()
  }
}
