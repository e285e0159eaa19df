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

  test("q193 event paths: per-source probabilities sum to ~1e6 ppm") {
    val r = SparkEntry.queries("q193_event_paths")(spark, sf)
    // floor division loses at most (#dst - 1) ppm per source
    val bad = r.groupBy("src")
      .agg(sum("p_ppm").as("tot"), count(lit(1)).as("k"))
      .filter(col("tot") > 1000000 || col("tot") <= lit(1000000) - col("k"))
    assert(bad.isEmpty, "transition rows must partition each source's mass")
    // and total transitions = events - one terminal per user
    val ev = sources.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(r.agg(sum("n")).head().getLong(0) == expected)
  }

  test("q193 event paths: single corpus exchange feeds the pair aggregate") {
    val p = finalPlan("q193_event_paths")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"expected one user_id exchange:\n$p")
  }

  test("q194 attribution credits only non-purchase channels within lookback") {
    val r = SparkEntry.queries("q194_attribution")(spark, sf).collect()
    val channels = r.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("view", "click", "signup", "error")))
    // attributed purchases cannot exceed total purchases
    val total = sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(r.map(_.getLong(1)).sum <= total)
  }

  test("q195 RFM: quartiles are balanced and keyed once per customer") {
    val r = SparkEntry.queries("q195_rfm")(spark, sf)
    val n = r.count()
    assert(r.select("custkey").distinct().count() == n, "one row per customer")
    // each quartile holds between floor(n/4) and ceil(n/4) customers
    for (c <- Seq("r_q", "f_q", "m_q")) {
      val sizes = r.groupBy(c).count().collect().map(_.getLong(1))
      assert(sizes.length == 4 && sizes.max - sizes.min <= 1,
        s"$c quartiles unbalanced: ${sizes.mkString(",")}")
    }
  }
}
