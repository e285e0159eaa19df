package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Resource-group analog ≙ the reference's resource control
  * (`/root/reference/docs/design/2023-09-21-tiflash-resource-control.md:58-64`:
  * equal-RU groups see ~equal query times under concurrent TPC-H
  * load): Spark FAIR scheduler pools with equal weight must let two
  * concurrent identical workloads finish in comparable wall time —
  * neither pool starves the other. */
class ResourceGroupSpec extends SparkTestBase {

  test("equal-weight fair pools run concurrent identical workloads in comparable time") {
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode") == "FAIR")
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    def workload(poolName: String): Long = {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", poolName)
      try {
        val t0 = System.nanoTime()
        (1 to 3).foreach { _ =>
          Tables.lineitem(spark, sf)
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(count(lit(1)), sum(col("l_quantity")))
            .collect()
        }
        (System.nanoTime() - t0) / 1000000L
      } finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
    }
    workload("warmup") // JIT/codegen outside the timed window
    val fa = Future(workload("group_a"))
    val fb = Future(workload("group_b"))
    val (ta, tb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    pool.shutdown()
    val ratio = math.max(ta, tb).toDouble / math.min(ta, tb).max(1L)
    assert(ratio < 4.0,
      s"unfair split between equal pools: ${ta}ms vs ${tb}ms (ratio $ratio)")
  }

  test("RU meter charges per-pool CPU and bytes (resource-group accounting)") {
    import graft.operators.ResourceControl
    val meter = new ResourceControl.RuMeter
    spark.sparkContext.addSparkListener(meter)
    try {
      def run(pool: String): Unit = {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
        try Tables.lineitem(spark, sf)
          .groupBy(col("l_returnflag")).agg(sum(col("l_quantity"))).collect()
        finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      }
      run("metered_a"); run("metered_b")
      // the listener bus is async — poll until both pools are charged
      val deadline = System.nanoTime() + 30L * 1000000000L
      var snap = meter.snapshot
      while ((!snap.contains("metered_a") || !snap.contains("metered_b")) &&
        System.nanoTime() < deadline) { Thread.sleep(100); snap = meter.snapshot }
      val a = snap.getOrElse("metered_a", fail("pool metered_a never charged"))
      val b = snap.getOrElse("metered_b", fail("pool metered_b never charged"))
      assert(a.cpuMs > 0 && b.cpuMs > 0, s"cpu must be metered: $snap")
      assert(a.inputBytes > 0 && b.inputBytes > 0,
        s"parquet scan bytes must be metered: $snap")
      assert(a.ru > 0 && b.ru > 0)
    } finally spark.sparkContext.removeSparkListener(meter)
  }

  test("MinTSO admission: capacity bounds waiters, min-TSO is never blocked") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    import graft.operators.ResourceControl.MinTsoAdmission
    val gate = new MinTsoAdmission(capacity = 1)
    val pool = Executors.newFixedThreadPool(4)
    val aIn = new CountDownLatch(1); val aRelease = new CountDownLatch(1)
    val cDone = new CountDownLatch(1); val bDone = new CountDownLatch(1)
    val order = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    // A (tso 10) occupies the only slot
    pool.submit(new Runnable { def run(): Unit =
      gate.admit(10L) { order.add(10L); aIn.countDown(); aRelease.await() } })
    assert(aIn.await(10, TimeUnit.SECONDS))
    // B (tso 20) must wait: slot full and 20 > min running
    pool.submit(new Runnable { def run(): Unit =
      gate.admit(20L) { order.add(20L); bDone.countDown() } })
    Thread.sleep(200)
    assert(order.size() === 1, "B must be queued behind the running A")
    // C (tso 5) is BELOW the running minimum — force-admitted past
    // capacity (the reference's liveness rule)
    pool.submit(new Runnable { def run(): Unit =
      gate.admit(5L) { order.add(5L); cDone.countDown() } })
    assert(cDone.await(10, TimeUnit.SECONDS),
      "min-TSO query must run immediately even at full capacity")
    assert(order.size() === 2 && order.get(1) === 5L)
    aRelease.countDown()
    assert(bDone.await(10, TimeUnit.SECONDS))
    pool.shutdown()
    assert(gate.peak === 2, "force admission ran 2 concurrently at capacity 1")
    assert(gate.forced === 1)
  }

  test("MinTSO admission: waiters drain in ascending TSO order, not arrival order") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    import graft.operators.ResourceControl.MinTsoAdmission
    val gate = new MinTsoAdmission(capacity = 1)
    val pool = Executors.newFixedThreadPool(5)
    val aIn = new CountDownLatch(1); val aRelease = new CountDownLatch(1)
    val done = new CountDownLatch(3)
    val order = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    pool.submit(new Runnable { def run(): Unit =
      gate.admit(1L) { aIn.countDown(); aRelease.await() } })
    assert(aIn.await(10, TimeUnit.SECONDS))
    // arrival order 40, 30, 20 — all above the running min, so they queue
    for (tso <- Seq(40L, 30L, 20L)) {
      pool.submit(new Runnable { def run(): Unit =
        gate.admit(tso) { order.add(tso); done.countDown() } })
      Thread.sleep(100) // fix arrival order
    }
    aRelease.countDown()
    assert(done.await(10, TimeUnit.SECONDS))
    pool.shutdown()
    assert(order.toArray.toSeq === Seq(20L, 30L, 40L),
      s"waiters must drain smallest-TSO-first, got $order")
  }
}
