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
}
