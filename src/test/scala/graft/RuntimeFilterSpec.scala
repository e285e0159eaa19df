package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Runtime bloom-filter join pruning ≙ the reference's runtime filters
  * (build side → IN/MIN_MAX filter pushed into the probe-side scan,
  * `/root/reference/dbms/src/DataStreams/RuntimeFilter.h:25-91`,
  * `gtest_runtime_filter_executor.cpp`). Spark's AQE injects a
  * might_contain(bloom) predicate on the probe side; size thresholds
  * are lowered so it triggers at test scale. */
class RuntimeFilterSpec extends SparkTestBase {

  test("bloom filter from the filtered build side reaches the probe side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> util.Try(spark.conf.get(k)).toOption }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("bloom"),
        s"expected runtime bloom filter in optimized plan:\n$optimized")
      // and the filtered result is still correct
      val viaFilter = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(viaFilter === without && viaFilter.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
