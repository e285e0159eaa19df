package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.MySqlCompat

/** Thirty-ninth tranche: late-materialization + generated-column
  * fixtures mirrored (`/root/reference/tests/fullstack-test/mpp/
  * apply_with_late_materialization.test`,
  * `mpp/late_materialization_extra_table_id_column.test`,
  * `mpp/late_materialization_generate_column.test`,
  * `fullstack-test/expr/generated_columns2.test`,
  * `fullstack-test2/clustered_index/prefixNext.test`): the Apply
  * (correlated first-by-order subquery) over a selectively-filtered
  * wide table, selective filters + duration aggregation over a
  * replicated table, virtual generated columns under NULL-heavy data
  * and NULL-compare filters, and prefix-PK NOT IN.
  */
class FullstackParitySpec39 extends SparkTestBase {
  import spark.implicits._

  test("apply_with_late_materialization.test: correlated first-by-order scalar subquery") {
    // 10 distinct ids × 2^11 copies (the fixture's >8192-row table)
    val t = spark.range(0, 2048).select(explode(expr("sequence(1, 10)")).as("id"))
      .select(col("id").cast("int").as("id"), lit(5).as("value"))
    val t1 = Seq((2, 5)).toDF("id", "value")
    t.createOrReplaceTempView("awlm_t")
    t1.createOrReplaceTempView("awlm_t1")
    // first value by (value) order ≡ min(value) — TiDB decorrelates the
    // ORDER BY ... LIMIT 1 Apply the same way before pushdown
    val out = spark.sql(
      """SELECT (SELECT min(t.value) FROM awlm_t t WHERE t.id = awlm_t1.id) xx
        |FROM awlm_t1 ORDER BY value LIMIT 5""".stripMargin).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(5))
  }

  test("late_materialization_extra_table_id_column.test: selective id filter + duration-hour rollup") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // 16,384 replicated rows with id ∈ {1, 10} + 2 fresh rows 11/12;
    // t is the MyDuration nanos encoding of 700:11:11.1234 / 710:...
    val ns700 = (700L * 3600 + 11 * 60 + 11) * 1000000000L + 123400000L
    val ns710 = (710L * 3600 + 11 * 60 + 11) * 1000000000L + 123400000L
    val bulk = spark.range(0, 16384).select(
      when(col("id") % 2 === 0, 1).otherwise(10).as("id"),
      when(col("id") % 2 === 0, 10).otherwise(11).as("age"),
      lit(ns700).as("t"))
    val fresh = Seq((11, 10, ns700), (12, 11, ns710)).toDF("id", "age", "t")
    val dir = Files.createTempDirectory("graft-lm39").toString + "/t"
    bulk.unionByName(fresh).coalesce(2)
      .write.mode("overwrite").parquet(dir)
    val all = spark.read.parquet(dir)
    assert(all.count() === 16386L)
    val sel = all.where(col("id") > 10)
      .select(col("id"), col("age"),
        MySqlCompat.mysql_duration_str(col("t"), 0).as("ts"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(sel === Set((11, 10, "700:11:11"), (12, 11, "710:11:11")))
    // the grouped rollup keeps the >24h duration hour (710)
    val grouped = all.where(col("id") > 11)
      .groupBy(MySqlCompat.mysql_extract_dur("HOUR", expr("t div 1000")).as("hour"))
      .agg(sum(col("age")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grouped === Set((710L, 11L)))
    // late-materialization analog: the pushed id filter lets the scan
    // emit a tiny fraction of the 16k rows
    val q = all.where(col("id") > 10)
    q.count()
    val executed = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = executed.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.metadata("PushedFilters").contains("GreaterThan(id,10)"))
  }

  test("late_materialization_generate_column.test: virtual column over NULL-heavy data") {
    // 2^14 all-NULL rows + one row with col2 = 'r2Ic'; COL1 is the
    // VIRTUAL generated column col102 DIV 10 (NULL-propagating)
    val nulls = spark.range(0, 16384).select(
      lit(null).cast("float").as("col102"), lit(null).cast("string").as("col2"))
    val one = Seq(("r2Ic")).toDF("col2")
      .select(lit(null).cast("float").as("col102"), col("col2"))
    val t = nulls.unionByName(one)
      .withColumn("col1", expr("cast(cast(col102 as bigint) div 10 as bigint)")) // generated (MySQL DIV truncates the float first)
    assert(t.count() === 16385L)
    val hit = t.where(col("col2") === "r2Ic").collect()
    assert(hit.length === 1 && hit(0).isNullAt(0) && hit(0).isNullAt(2))
    // col1 = NULL is UNKNOWN for every row — only the OR arm matches
    val orHit = t.where(col("col1") === lit(null) || col("col2") === "r2Ic")
      .collect()
    assert(orHit.length === 1 && orHit(0).getString(1) === "r2Ic")
  }

  test("generated_columns2.test: chained virtual columns + TIME(6) hour filter") {
    // b = a+1 virtual, d = c+1 virtual; t TIME(6) nanos
    val ns = (10L * 60 + 10) * 1000000000L + 123456000L // 000:10:10.123456
    val rows = Seq((1, 2, ns), (3, 4, ns + 3600L * 1000000000L),
      (5, 6, ns + 2 * 3600L * 1000000000L)).toDF("a", "c", "t")
    val t = rows.withColumn("b", col("a") + 1).withColumn("d", col("c") + 1)
    val hit = t.where(MySqlCompat.mysql_duration_str(col("t"), 6) === "00:10:10.123456")
      .select(col("a"), col("b"), col("c"), col("d"),
        MySqlCompat.mysql_extract_dur("HOUR", expr("t div 1000")).as("h"))
      .collect()
    assert(hit.length === 1)
    assert((hit(0).getInt(0), hit(0).getInt(1), hit(0).getInt(2),
      hit(0).getInt(3), hit(0).getLong(4)) === ((1, 2, 2, 3, 0L)))
  }

  test("prefixNext.test: NOT IN over the complete prefix-PK value set is empty") {
    val t1 = Seq("a", "b", "aaaaaa").toDF("a")
    assert(t1.where(!col("a").isin("a", "b", "aaaaaa")).isEmpty)
  }
}
