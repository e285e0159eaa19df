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

  // One hot key with ~83% of the fact side — unsalted, every one of its
  // rows hashes to a single task regardless of cluster width.
  private def hotFact = {
    import spark.implicits._
    spark.range(0, 60000).select(
      when($"id" < 50000, 0L).otherwise($"id" % 100).as("k"), $"id".as("v"))
  }

  private def dim100 = {
    import spark.implicits._
    spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("w"))
  }

  test("saltedJoin: result identical to the plain join") {
    import org.apache.spark.sql.functions._
    val plain = hotFact.join(dim100, "k")
    val salted = operators.SkewRemedy.saltedJoin(
      hotFact, dim100, Seq("k"), hash(col("v")), salts = 8)
      .select(plain.columns.map(col).toSeq: _*)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hotColdSaltedJoin: result identical, hot AND cold paths exercised") {
    import org.apache.spark.sql.functions._
    val plain = hotFact.join(dim100, "k")
    // hotShare 0.5 → only key 0 (83%) is hot; keys 1..99 take the cold path
    val hc = operators.SkewRemedy.hotColdSaltedJoin(
      hotFact, dim100, Seq("k"), hash(col("v")), salts = 8, hotShare = 0.5)
      .select(plain.columns.map(col).toSeq: _*)
    assert(hc.exceptAll(plain).isEmpty && plain.exceptAll(hc).isEmpty)
    // degenerate thresholds: everything hot / nothing hot — still exact
    val allHot = operators.SkewRemedy.hotColdSaltedJoin(
      hotFact, dim100, Seq("k"), hash(col("v")), salts = 4, hotShare = 1e-9)
      .select(plain.columns.map(col).toSeq: _*)
    assert(allHot.exceptAll(plain).isEmpty && plain.exceptAll(allHot).isEmpty)
    val noneHot = operators.SkewRemedy.hotColdSaltedJoin(
      hotFact, dim100, Seq("k"), hash(col("v")), salts = 8, hotShare = 1.0)
      .select(plain.columns.map(col).toSeq: _*)
    assert(noneHot.exceptAll(plain).isEmpty && plain.exceptAll(noneHot).isEmpty)
  }

  test("salting bounds the per-task input share of the hot key") {
    import org.apache.spark.sql.functions._
    // Simulate the shuffle assignment the (k, _salt) hash join uses:
    // HashPartitioning's partition id is Murmur3(keys, seed 42) pmod
    // numPartitions — the SQL hash() function is the same Murmur3, so
    // this reproduces the real task-input distribution exactly.
    val parts = 32
    val salts = 8
    def maxShare(withSalt: Boolean) = {
      val salted =
        if (withSalt) hotFact.withColumn("_salt", pmod(hash(col("v")), lit(salts)))
        else hotFact.withColumn("_salt", lit(0))
      val byTask = salted
        .withColumn("pid", pmod(hash(col("k"), col("_salt")), lit(parts)))
        .groupBy("pid").count()
        .agg(max("count").as("mx"), sum("count").as("tot"))
        .head()
      byTask.getLong(0).toDouble / byTask.getLong(1)
    }
    val unsalted = maxShare(withSalt = false)
    val salted = maxShare(withSalt = true)
    // unsalted: the hot key's ~83% lands in ONE task
    assert(unsalted > 0.8, s"expected hot-key concentration, got $unsalted")
    // salted: no task exceeds ~2x the ideal hot-key slice
    // (0.83/8 ≈ 0.104 ideal; bound leaves room for cold-key collisions)
    assert(salted < 2.0 * 0.83 / salts + 0.05,
      s"salted max task share $salted not bounded")
  }
}
