package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Resource-control surface ≙ the reference's RU-metered resource
  * groups + MinTSO admission
  * (`/root/reference/docs/design/2023-09-21-tiflash-resource-control.md`,
  * `/root/reference/dbms/src/Flash/ResourceControl/LocalAdmissionController.h`,
  * `/root/reference/dbms/src/Flash/Mpp/MinTSOScheduler.cpp`).
  *
  * Spark-native mapping: scheduler POOLS are the resource groups (the
  * FAIR scheduler already provides weighted sharing, asserted in
  * `ResourceGroupSpec`); what the reference adds on top is (a) METERING
  * — each group's consumed Request Units, fed back into token-bucket
  * throttling — and (b) ADMISSION — the MinTSO rule that bounds
  * concurrent queries while guaranteeing the oldest (minimum-TSO) query
  * is never blocked, so admission control can never deadlock a
  * distributed query. Both are implemented here against public Spark
  * APIs: a `SparkListener` accumulates per-pool task metrics (the same
  * counters the reference meters: CPU time and bytes moved), and a
  * monitor-based gate reproduces the MinTSO admission rule for
  * driver-side query submission.
  */
object ResourceControl {

  /** Per-group resource usage. RU weights follow the reference's
    * published accounting shape (CPU milliseconds and 64 KiB I/O units
    * both map to request units; `2023-09-21-tiflash-resource-control.md`
    * meters CPU + read bytes). The absolute scale is a config knob in
    * the reference too — what matters for control is proportionality.
    */
  final case class Usage(cpuMs: Long, inputBytes: Long, shuffleBytes: Long) {
    def ru: Double = cpuMs / 3.0 + inputBytes / 65536.0 + shuffleBytes / 65536.0
    def +(o: Usage): Usage =
      Usage(cpuMs + o.cpuMs, inputBytes + o.inputBytes, shuffleBytes + o.shuffleBytes)
  }

  /** RU meter: attach via `spark.sparkContext.addSparkListener`.
    * Stages inherit the submitting thread's scheduler pool; tasks are
    * charged to their stage's pool. At 100 TB this is the same
    * listener-bus mechanism Spark's own AppStatusListener uses — O(1)
    * per task end, no query-path overhead. */
  final class RuMeter extends SparkListener {
    private val stagePool = new ConcurrentHashMap[Int, String]()
    private val usage = new ConcurrentHashMap[String, Usage]()

    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
      val pool = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.scheduler.pool")))
        .getOrElse("default")
      stagePool.put(e.stageInfo.stageId, pool)
    }

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val pool = Option(stagePool.get(e.stageId)).getOrElse("default")
        val u = Usage(m.executorCpuTime / 1000000L,
          m.inputMetrics.bytesRead,
          m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten)
        usage.merge(pool, u, (a: Usage, b: Usage) => a + b)
      }
    }

    def snapshot: Map[String, Usage] = {
      val b = Map.newBuilder[String, Usage]
      usage.forEach((k, v) => b += (k -> v))
      b.result()
    }
  }

  /** MinTSO admission gate ≙ `MinTSOScheduler.cpp`: at most `capacity`
    * queries run; among waiters the SMALLEST TSO is admitted first; and
    * a query whose TSO is below every running query's is force-admitted
    * even past capacity (the reference's key liveness rule — the
    * minimum-TSO query must never be blocked, or a distributed query
    * waiting on its own later fragments deadlocks). */
  final class MinTsoAdmission(capacity: Int) {
    require(capacity >= 1)
    private val lock = new Object
    private val running = scala.collection.mutable.SortedSet.empty[Long]
    private val waiting = scala.collection.mutable.SortedSet.empty[Long]
    @volatile private var peakRunning = 0
    @volatile private var forceAdmissions = 0

    def admit[T](tso: Long)(body: => T): T = {
      lock.synchronized {
        require(!running.contains(tso) && !waiting.contains(tso),
          s"duplicate tso $tso")
        waiting += tso
        def admissible: Boolean = waiting.head == tso &&
          (running.size < capacity || tso < running.head)
        while (!admissible) lock.wait()
        if (running.size >= capacity) forceAdmissions += 1
        waiting -= tso
        running += tso
        peakRunning = math.max(peakRunning, running.size)
      }
      try body
      finally lock.synchronized { running -= tso; lock.notifyAll() }
    }

    /** Peak concurrent admissions (can exceed capacity only via the
      * min-TSO liveness rule). */
    def peak: Int = peakRunning
    /** How many admissions used the past-capacity min-TSO exception. */
    def forced: Int = forceAdmissions
  }
}
