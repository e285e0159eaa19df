package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Shapes + invariants of the behavioral analytics family (q122 pivot,
  * q123 funnel, q124 cohort retention). */
class AnalyticsSpec extends SparkTestBase {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q122 pivot compiles to one partial+final hash aggregate") {
    val p = finalPlan("q122_pivot")
    assert("Exchange".r.findAllIn(p).length == 1, s"expected 1 shuffle:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial+final agg")
  }

  test("q123 funnel: both running windows share one shuffle and one sort") {
    val p = finalPlan("q123_funnel")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"expected one user_id exchange:\n$p")
    // the chained windows are dependent (the second consumes qts built
    // from the first), so they stay two Window operators — but the
    // second must reuse the child ordering, not re-sort
    assert("Sort \\[user_id".r.findAllIn(p).length == 1,
      s"second window must not re-sort:\n$p")
  }

  test("q123 funnel counts are bounded by per-user purchases") {
    val funnels = SparkEntry.queries("q123_funnel")(spark, sf)
    assert(funnels.agg(sum("funnels")).head().getLong(0) > 0,
      "fixture should complete at least one funnel")
    val purchases = sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("np"))
    val over = funnels.join(purchases, "user_id")
      .filter(col("funnels") > col("np"))
    assert(over.isEmpty, "a user completed more funnels than purchases")
    // and no funnel user without any purchase at all
    assert(funnels.join(purchases, Seq("user_id"), "left_anti").isEmpty)
  }

  test("q124 cohort week-0 cells sum to the distinct-user total") {
    val r = SparkEntry.queries("q124_cohort_retention")(spark, sf)
    val week0 = r.filter(col("week_offset") === 0)
      .agg(sum("n_users")).head().getLong(0)
    val users = sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(week0 == users,
      s"every user must appear in their own cohort's week 0 ($week0 != $users)")
  }
}
