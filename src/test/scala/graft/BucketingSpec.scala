package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Co-located join via bucketing — the Spark analog of pre-partitioned
  * MPP joins (the reference co-locates via TiDB's hash-partitioned
  * exchanges; a 100 TB Spark deployment bucketizes its fact tables so
  * repeated joins on the bucket key need no shuffle at all). Asserts
  * the bucketed join plan contains NO shuffle exchange. */
class BucketingSpec extends SparkTestBase {

  test("bucketed fact tables join without a shuffle exchange") {
    // default (gitignored) spark-warehouse dir; warehouse.dir is static
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")
    // force a non-broadcast join so colocation is what saves the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
