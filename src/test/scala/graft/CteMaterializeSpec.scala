package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** CTESink/CTESource materialization analog (≙ the reference's shared
  * CTE materialize-once-fan-out,
  * `/root/reference/dbms/src/Operators/CTE.cpp`): a cached
  * intermediate is computed once and every consumer reads the
  * in-memory copy instead of rescanning the source. (Spark SQL `WITH`
  * inlines by default — q23 covers that form; `.cache()` is the
  * explicit materialization the reference operator performs.) */
class CteMaterializeSpec extends SparkTestBase {

  test("cached CTE serves multiple consumers from memory (materialize once)") {
    val cte = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 25)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .cache()
    try {
      val a = cte.groupBy(col("l_returnflag")).count()
      val b = cte.agg(sum(col("l_quantity")))
      a.collect(); b.collect()
      for (df <- Seq(a, b)) {
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("InMemoryTableScan"),
          s"consumer did not read the materialized CTE:\n$plan")
      }
      // consistency with an uncached recompute
      val direct = Tables.lineitem(spark, sf).filter(col("l_quantity") > 25).count()
      assert(cte.count() === direct)
    } finally cte.unpersist()
  }
}
