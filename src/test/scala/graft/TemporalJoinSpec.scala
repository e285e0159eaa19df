package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Shape + semantics of the inequality-join family (q120 as-of, q121
  * range) and the curation/bigsum additions. Each operator is checked
  * two ways: the physical plan is the scale-safe one (no cartesian, no
  * per-row range probe), and the result equals a naive direct
  * implementation of the same semantics.
  */
class TemporalJoinSpec extends SparkTestBase {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q120 as-of join: one hash exchange on user_id, no join operator") {
    val p = finalPlan("q120_asof_join")
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"expected exactly one user_id exchange:\n$p")
  }

  test("q120 as-of join matches the naive inequality-join computation") {
    val ev = sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("ts").as("pts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val naive = purchases
      .join(clicks, col("pu") === col("cu"), "left")
      .groupBy(col("event_id"))
      .agg(max(when(col("cts") <= col("pts"), col("cts"))).as("click_ts"),
        min(when(col("cts") > col("pts"), col("cts"))).as("next_click_ts"))
    val got = SparkEntry.queries("q120_asof_join")(spark, sf)
      .select(col("event_id"), col("click_ts"), col("next_click_ts"))
    assert(got.join(naive, Seq("event_id"))
      .filter(!(got("click_ts") <=> naive("click_ts")) ||
        !(got("next_click_ts") <=> naive("next_click_ts"))).isEmpty,
      "as-of result diverges from naive inequality join")
    assert(got.count() == naive.count())
  }

  test("q121 range join: bucketed equi-join, no cartesian / BNLJ") {
    val p = finalPlan("q121_range_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"range join must be the bucketed equi-join:\n$p")
    assert(p.contains("bucket"), s"expected the bucket equi-key:\n$p")
  }

  test("q121 range join matches the naive non-equi join") {
    val li = sources.Tables.lineitem(spark, sf).select(col("l_extendedprice"))
    val iv = sources.Tables.nation(spark, sf).select(
      col("n_nationkey").as("band_id"),
      (col("n_nationkey") * 4200.0).as("lo"),
      (col("n_nationkey") * 4200.0 + 1500.0 +
        (col("n_nationkey") % 7) * 2000.0).as("hi"))
    val naive = li.join(iv,
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band_id")).agg(count(lit(1)).as("n"))
    val got = SparkEntry.queries("q121_range_join")(spark, sf)
      .select(col("band_id"), col("n"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "bucketed range join diverges from naive non-equi join")
  }

  test("q117 decontamination: every benchmark snippet hits its own doc") {
    val got = SparkEntry.queries("q117_decontaminate")(spark, sf)
    assert(got.filter(col("n_contaminated") < 1).isEmpty,
      "a snippet failed to match the doc it was cut from")
    assert(got.count() > 0)
  }

  test("q119 mixture weights sum to ~1e6 ppm and quotas to ~10000") {
    val r = SparkEntry.queries("q119_domain_mixture")(spark, sf)
      .agg(sum("weight_ppm").as("ppm"), sum("quota").as("q"), count(lit(1)).as("k"))
      .head()
    val (ppm, q, k) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // floor division: each source loses < 1 unit
    assert(ppm > 1000000L - k && ppm <= 1000000L, s"ppm=$ppm k=$k")
    assert(q > 10000L - k && q <= 10000L, s"quota=$q k=$k")
  }

  test("q118 big-int sum is exact at arbitrary precision (8-partition merge)") {
    import java.math.BigInteger
    val vals = (1 to 1000).map(i => BigInteger.valueOf(i.toLong * 7919)
      .multiply(BigInteger.TEN.pow(35)))
    val expected = vals.reduce(_ add _).toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(v => Tuple1(v.toString)), 8))
      .toDF("v")
    val bigSum = udaf(functions.BigIntSumAgg,
      org.apache.spark.sql.Encoders.STRING)
    assert(df.agg(bigSum(col("v"))).head().getString(0) == expected)
    // 1000 * ~1e38-scale values: 42 digits, far past Decimal(38)
    assert(expected.length > 38)
    // empty input -> NULL, like SQL SUM
    assert(df.limit(0).agg(bigSum(col("v"))).head().isNullAt(0))
  }

  test("q184 decimal(65,30) sum carries fraction overflow exactly across 8 partitions") {
    // 1000 rows of 0.999…9 (30 nines): the exact total is
    // 1000·(1 − 10⁻³⁰) = 999.<27 nines>000 — every digit of the result
    // is produced by fraction carries interacting across partition
    // merges, the case a truncating or per-partition-rounding sum gets
    // wrong
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 1000).map(_ => Tuple1("0." + "9" * 30)), 8))
      .toDF("v")
    val decSum = udaf(functions.BigIntSum.Decimal65SumAgg,
      org.apache.spark.sql.Encoders.STRING)
    assert(df.agg(decSum(col("v"))).head().getString(0)
      === "999." + "9" * 27 + "000")
    // 35-integer-digit + 30-fraction-digit values sum exactly too
    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1 to 100).map(i => Tuple1(s"${i}${"0" * 34}.${"0" * 28}25")), 8))
      .toDF("v")
    // Σ i·10³⁴ = 5050·10³⁴; Σ 25·10⁻³⁰ = 2500·10⁻³⁰ → …0002500 in the
    // 30 fraction digits
    assert(wide.agg(decSum(col("v"))).head().getString(0)
      === "5050" + "0" * 34 + "." + "0" * 26 + "2500")
    assert(df.limit(0).agg(decSum(col("v"))).head().isNullAt(0))
  }

  test("q204 epoch shuffle: bijective positions, balanced shards, reshuffled order") {
    val r = SparkEntry.queries("q204_epoch_shuffle")(spark, sf)
    val n = sources.Tables.documents(spark, sf).count()
    assert(r.count() === n, "permutation covers every document")
    // (shard, idx) is a bijection onto 0..n-1
    assert(r.select(col("shard") + col("idx") * 32).distinct().count() === n)
    // shards balanced within 1
    val sizes = r.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 32 && sizes.max - sizes.min <= 1)
    // the permutation is not the identity: doc order within shard 0
    // differs from doc_id order
    val s0 = r.filter(col("shard") === 0).orderBy("idx")
      .select("doc_id").collect().map(_.getLong(0))
    assert(s0.toSeq !== s0.sorted.toSeq, "epoch order must be shuffled")
  }

  test("q205 length buckets: power-of-two buckets cover and bound every doc") {
    val r = SparkEntry.queries("q205_length_buckets")(spark, sf).collect()
    val buckets = r.map(_.getLong(0))
    assert(buckets.forall(b => (b & (b - 1)) == 0), "buckets are powers of two")
    val total = sources.Tables.documents(spark, sf).count()
    assert(r.map(_.getLong(1)).sum === total, "every document is bucketed")
    // capacity is never exceeded: pad = bucket·docs − tokens ≥ 0
    assert(r.forall(x => x.getLong(3) >= 0 &&
      x.getLong(3) === x.getLong(0) * x.getLong(1) - x.getLong(2)))
  }
}
