package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew handling — the engine-level complement of the
  * manual salting guard (q49): a join partition dominated by one hot
  * key is split at runtime by AQE's OptimizeSkewedJoin (≙ the
  * reference's fine-grained shuffle + MPP partition balancing). */
class SkewJoinSpec extends SparkTestBase {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // disable broadcast so the join stays sort-merge (the skewed path)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // one hot key holding ~83% of the fact side
      val fact = spark.range(0, 60000).select(
        when($"id" < 50000, 0L).otherwise($"id" % 100).as("k"), $"id".as("v"))
      val dim = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = fact.join(dim, "k")
      // materialize THIS dataframe so AQE finalizes its plan (count()
      // would be a separate query execution)
      assert(joined.collect().length === 60000, "row count must survive the skew split")
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val plan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split join (skew=true) in plan:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
