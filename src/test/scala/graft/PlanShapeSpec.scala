package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape assertions ≙ the reference's interpreter golden tests
  * (`/root/reference/dbms/src/Flash/tests/gtest_planner_interpreter.cpp`):
  * the physical plan, not just the result, must be the one a 100 TB
  * deployment needs — filters pushed to the parquet scan, small dims
  * broadcast, top-k as TakeOrderedAndProject. */
class PlanShapeSpec extends SparkTestBase {

  private def planString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val executed = df.queryExecution.executedPlan
    val finalPlan: SparkPlan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.toString
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = planString("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter:\n$p")
  }

  test("q1_agg does partial then final aggregation") {
    val p = planString("q1_agg")
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).length >= 2, "expected partial+final agg")
  }

  test("q5_join_inner broadcasts the dimension side") {
    val p = planString("q5_join_inner")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q3_topn plans TakeOrderedAndProject (no global sort)") {
    val p = planString("q3_topn")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q2_filter_project prunes columns at the scan") {
    val p = planString("q2_filter_project")
    assert(p.contains("ReadSchema"), p)
    // only the 7 needed columns of 11 should be read
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_shipdate") && !read.contains("l_partkey"),
      s"scan reads pruned columns: $read")
  }

  test("q51 KNN broadcasts the query vectors (no shuffle of the big side)") {
    val p = planString("q51_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected broadcast for query set:\n$p")
  }
}
