package graft

import org.apache.spark.sql.functions._

/** The custom DSv2 connector: correctness of the generated data,
  * column pruning, pushed-filter reporting, and — the reference's
  * MinMaxIndex analog — whole-partition skipping for pushed id ranges
  * (`/root/reference/dbms/src/Storages/DeltaMerge/Index/MinMaxIndex.h:31`). */
class GenSourceSpec extends SparkTestBase {

  private def gen(rows: Long = 1000, slices: Int = 8) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("generates the deterministic table with full parallelism") {
    val df = gen()
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 8)
    val r = df.where(col("id") === 123).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === (123L * 2654435761L) % 1000003L)
    assert(r.head.getString(2) === "t" + (123 % 7))
  }

  test("pushed id range skips partitions wholesale (rough-set / pack skipping)") {
    // ids 900..999 live in the last of 8 slices (125 ids per slice)
    val df = gen().where(col("id") >= 900)
    assert(df.count() === 100)
    assert(df.rdd.getNumPartitions === 1,
      "only the one overlapping partition may be planned")
    // the planned scan reports the pruned id range (the pushed bound)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("prunedRange=[900,1000)"), s"missing pruned range:\n$plan")

    val eq = gen().where(col("id") === 500)
    assert(eq.rdd.getNumPartitions === 1)
    assert(eq.count() === 1)

    val none = gen().where(col("id") > 5000)
    assert(none.rdd.getNumPartitions === 0, "disjoint range plans zero partitions")
    assert(none.count() === 0)
  }

  test("residual predicates stay post-scan and results are exact") {
    // tag predicate is NOT pushable — correctness must be unchanged
    val df = gen().where(col("id") < 700 && col("tag") === "t3")
    val expect = (0L until 700L).count(id => id % 7 == 3)
    assert(df.count() === expect)
    // bounds compose: [200, 300) spans two 125-wide slices → 2 planned
    val band = gen().where(col("id") >= 200 && col("id") < 300)
    assert(band.count() === 100)
    assert(band.rdd.getNumPartitions === 2)
  }

  test("column pruning generates only the requested fields") {
    val df = gen().select("val")
    assert(df.schema.fieldNames.toSeq === Seq("val"))
    val s = df.agg(sum(col("val"))).head.getLong(0)
    val expect = (0L until 1000L).map(id => (id * 2654435761L) % 1000003L).sum
    assert(s === expect)
  }

  test("the DSv2 table joins and aggregates like any other source") {
    val df = gen(1400, 8)
    // per-tag aggregate over the generated hash column
    val agg = df.groupBy(col("tag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg.size === 7 && agg.values.sum === 1400)
    assert(agg("t0") === 200)
  }

  test("aggregate pushdown: grouped COUNT/MIN/MAX computed inside the source") {
    // ≙ the reference's coprocessor-level partial aggregation — the
    // storage read emits group partials, no row is materialized
    val q = gen(rows = 10001, slices = 8).groupBy(col("tag"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"), max(col("id")).as("mx"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AGG-pushed"), s"aggregate not pushed:\n$plan")
    val got = q.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for (t <- 0 until 7) {
      val ids = (0L until 10001L).filter(_ % 7 == t)
      assert(got(s"t$t") === ((ids.length.toLong, ids.min, ids.max)), s"tag t$t")
    }
  }

  test("aggregate pushdown: ungrouped COUNT(*)/MIN/MAX with a pushed id range") {
    val q = gen(rows = 10001, slices = 8)
      .where(col("id") >= 100 && col("id") < 5000)
      .agg(count(lit(1)), min(col("id")), max(col("id")))
    assert(q.queryExecution.executedPlan.toString.contains("AGG-pushed"))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4900L, 100L, 4999L)))
  }

  test("limit pushdown: the scan emits exactly the first n surviving ids") {
    // complete pushdown: the id order makes LIMIT a range truncation
    val q = gen(rows = 100000, slices = 8).where(col("id") >= 500).limit(7)
    val got = q.collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (500L until 507L).toSeq)
    // the scan's pruned range reflects the limit (visible in the plan)
    assert(q.queryExecution.executedPlan.toString.contains("prunedRange=[500,507)"))
  }

  test("top-N pushdown: ORDER BY id DESC LIMIT n narrows to the tail of the range") {
    val q = gen(rows = 100000, slices = 8)
      .where(col("id") < 90000).orderBy(col("id").desc).limit(5)
    assert(q.collect().map(_.getLong(0)).toSeq
      === Seq(89999L, 89998L, 89997L, 89996L, 89995L))
    assert(q.queryExecution.executedPlan.toString.contains("prunedRange=[89995,90000)"))
    // a top-N on a non-handle column is NOT pushed; results stay exact
    val byVal = gen(rows = 1000).orderBy(col("val").desc).limit(3)
    assert(byVal.queryExecution.executedPlan.toString.contains("prunedRange=[0,1000)"))
    val expect = (0L until 1000L).map(graft.sources.GenSource.valOf)
      .sorted(Ordering[Long].reverse).take(3)
    assert(byVal.collect().map(_.getLong(1)).toSeq === expect)
  }

  test("runtime filtering: a selective join build side narrows the scan at execution") {
    import spark.implicits._
    // ≙ RuntimeFilter.h — the build side's id set reaches the probe scan
    val dim = Seq(70000L, 70007L, 70014L).toDF("k")
    val fact = gen(rows = 100000, slices = 8)
    val q = fact.join(dim, fact("id") === dim("k"))
    val got = q.collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(70000L, 70007L, 70014L))
    // the scan advertises the runtime-filterable attribute; when Spark
    // injects a DPP/runtime IN filter, partitions outside [min,max] of
    // the build keys are skipped at execution (observable in metrics
    // when present; correctness must hold either way)
    val scanStr = q.queryExecution.executedPlan.toString
    assert(scanStr.contains("BatchScan"), scanStr)
  }

  test("runtime filter() narrows the planned partitions directly") {
    // drive the SupportsRuntimeFiltering contract explicitly, as the
    // runtime would: an IN filter on id shrinks planInputPartitions
    val builder = new graft.sources.GenScanBuilder(100000L, 8)
    val scan = builder.build().asInstanceOf[graft.sources.GenScan]
    assert(scan.planInputPartitions().length === 8)
    val in: org.apache.spark.sql.sources.Filter = org.apache.spark.sql.sources.In(
      "id", Array(70000L, 70007L, 70014L).map(_.asInstanceOf[AnyRef]))
    scan.filter(Array(in))
    val parts = scan.planInputPartitions()
    assert(parts.length === 1, parts.mkString(","))
  }

  test("keep-order scan: reported id ordering elides the partition-local sort") {
    // ≙ the TableScan keep_order option — handle-sorted storage output
    val q = gen(rows = 100000, slices = 8).where(col("id") > 1000)
      .sortWithinPartitions(col("id"))
      .select(col("id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), s"reported ordering should elide the sort:\n$plan")
    // and the data really is partition-locally ascending
    import spark.implicits._
    val ok = q.mapPartitions { it =>
      var prev = Long.MinValue; var sorted = true
      it.foreach { r => val v = r.getLong(0); if (v < prev) sorted = false; prev = v }
      Iterator.single(sorted)
    }.collect()
    assert(ok.forall(identity))
  }

  test("storage-partitioned join: two tag-partitioned tables join with NO exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def tagged(rows: Long) = spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString).option("partitionByTag", "true").load()
    val prevBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = tagged(700).groupBy(col("tag")).agg(count(lit(1)).as("na"))
      val b = tagged(1400).groupBy(col("tag")).agg(count(lit(1)).as("nb"))
      val j = a.join(b, "tag")
      val shuffles = j.queryExecution.executedPlan
        .collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"storage-partitioned join must not shuffle:\n${j.queryExecution.executedPlan}")
      val got = j.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === (0 until 7).map(t => (s"t$t", 100L, 200L)).toSet)
    } finally {
      prevBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }

  test("aggregate pushdown: unsupported aggregates fall back to the row scan, same results") {
    val q = gen(rows = 1000).groupBy(col("tag")).agg(sum(col("val")).as("s"))
    assert(!q.queryExecution.executedPlan.toString.contains("AGG-pushed"))
    val direct = (0L until 1000L).groupBy(id => "t" + id % 7)
      .map { case (t, ids) => t -> ids.map(graft.sources.GenSource.valOf).sum }
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === direct)
  }
}
