package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Twenty-ninth tranche: the expr-dir closers
  * (`/root/reference/tests/fullstack-test/expr/{cast_as_json_issue10845,
  * generated_columns, duration_filter_late_materialization,
  * timestamp_filter_late_materialization}.test`): JSON-extract filters
  * merged with scan pushdown must not invert (the #10845 regression),
  * virtual generated columns compute through base-column filters,
  * and selective duration/timestamp filters under the
  * late-materialization read path. */
class FullstackParitySpec29 extends SparkTestBase {
  import spark.implicits._
  import graft.functions.MySqlJsonFunctions._

  test("cast_as_json_issue10845.test: JSON-extract filters merged with pushed scan filters do not invert") {
    val dir = Files.createTempDirectory("graft-10845").toString + "/t"
    val rows = Seq(
      (1747312496000L, "2026-05-15 12:34:56", """{"popup_id":"123"}"""),
      (1747312556000L, "2026-05-15 12:35:56", """{"popup_id":"123"}"""),
      (1747312616000L, "2026-05-15 12:36:56", """{"popup_id":"0"}"""),
      (1747312676000L, "2026-05-15 12:37:56", """{"popup_id":"456"}"""),
      (1747312736000L, "2026-05-15 12:38:56", """{"popup_id":"789"}"""))
    rows.toDF("event_timestamp", "ts", "action_params")
      .write.mode("overwrite").parquet(dir)
    // read back so the Selection sits above REAL pushed-down scan filters
    val t = spark.read.parquet(dir)
      .where($"event_timestamp" > 0L) // pushable scan predicate
    val ex = json_extract($"action_params", lit("$.popup_id"))
    assert(t.where(ex.isNull).count() === 0L)
    assert(t.where(ex.isNotNull).count() === 5L)
    val proj = t.where(ex.isNotNull)
      .select($"event_timestamp", json_unquote(ex).as("popup_id"))
      .orderBy($"event_timestamp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(proj === Seq(
      (1747312496000L, "123"), (1747312556000L, "123"), (1747312616000L, "0"),
      (1747312676000L, "456"), (1747312736000L, "789")))
    // the normalized-json column form agrees with the raw-text form
    val tj = spark.read.parquet(dir)
      .withColumn("action_params", cast_string_as_json($"action_params"))
    assert(tj.where(json_extract($"action_params", lit("$.popup_id")).isNotNull)
      .count() === 5L)
  }

  test("generated_columns.test: virtual columns compute through base-column filters") {
    val base = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9).map(i => (i, i * 10, i * 100))
      .toDF("a", "c", "e")
      // b = a+1 virtual, d = c+1 virtual — computed at read, never stored
      .withColumn("b", $"a" + 1).withColumn("d", $"c" + 1)
      .select($"a", $"b", $"c", $"d", $"e")
    for (i <- 1 to 9) {
      val got = base.where($"c" === i * 10).collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSeq
      assert(got === Seq((i, i + 1, i * 10, i * 10 + 1, i * 100)))
    }
    // filtering ON the generated column also works
    assert(base.where($"b" === 5).select($"a").collect().head.getInt(0) === 4)
    assert(base.where($"d" === 51).select($"c").collect().head.getInt(0) === 50)
  }

  test("duration_filter_late_materialization.test: selective duration predicates over the replicated table") {
    def us(sign: Int, h: Long, m: Long, s: Long, f: Long): Long =
      sign * (h * 3600000000L + m * 60000000L + s * 1000000L + f)
    val baseRows = Seq(
      (us(-1, 700, 10, 10, 123500L), 1), (us(1, 700, 11, 11, 123500L), 2),
      (us(1, 600, 11, 11, 123500L), 3))
    // 2^13 copies materialized as ONE local relation (a deep union tree
    // of 8192 branches would explode planning time)
    val t = (Seq.fill(8192)(baseRows).flatten ++
      Seq((us(1, 8, 20, 0, 0L), 4), (us(1, 11, 11, 35, 0L), 5))).toDF("a", "i")
    assert(t.count() === 3L * 8192 + 2)
    val target = us(1, 500, 11, 11, 123500L)
    // every selective probe on the absent duration is empty
    assert(t.where($"a" === target).count() === 0L)
    assert(t.where(($"a" / 3600000000L).cast("long") === 500L).count() === 0L)
    assert(t.where(($"a" % 3600000000L / 60000000L).cast("long") === 13L).count() === 0L)
    assert(t.where(($"a" % 60000000L / 1000000L).cast("long") === 14L).count() === 0L)
    // bit_and over the hhmmss rendering of the single row in the range
    val num = ($"a" / 3600000000L).cast("long") * 10000L +
      ($"a" % 3600000000L / 60000000L).cast("long") * 100L +
      ($"a" % 60000000L / 1000000L).cast("long")
    val lo = us(1, 8, 20, 9, 0L); val hi = us(1, 11, 11, 36, 0L)
    val got = t.withColumn("n", num)
      .where($"i" > 0 && $"a".between(lo, hi))
      .groupBy($"i").agg(expr("bit_and(n)").as("ba"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got === Seq((5, 111135L)))
  }

  test("timestamp_filter_late_materialization.test: selective tz-anchored timestamp filter + row-group skip") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = Files.createTempDirectory("graft-tslm").toString + "/t"
    // 10 base rows × 2^11 at 2025-03-03, plus 10 fresh 2026 rows whose
    // wall-clock was given in Asia/Singapore
    val baseRows = (0 until 10).map(i =>
      (1001 + i, s"2025-03-03 18:${"%02d".format(i * 5)}:00"))
    val big = Seq.fill(2048)(baseRows).flatten.toDF("sid", "w")
      .withColumn("created_at", $"w".cast("timestamp"))
    val fresh = (0 until 10).map(i =>
      (2001 + i, s"2026-03-03 18:${"%02d".format(i * 5)}:00")).toDF("sid", "w")
      .withColumn("created_at", to_utc_timestamp($"w", "Asia/Singapore"))
    big.union(fresh).select($"sid", $"created_at")
      .orderBy($"created_at").coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(dir)
    val total = 10L * 2048 + 10
    val cut = to_utc_timestamp(lit("2026-03-01 00:00:00"), "Asia/Singapore")
    val q = spark.read.parquet(dir).where($"created_at" > cut)
    assert(q.count() === 10L)
    val executed = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val scan = executed.collectLeaves().collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.metadata("PushedFilters").contains("GreaterThan(created_at,"))
    assert(scan.metrics("numOutputRows").value < total / 10,
      "the sorted write must let row-group stats skip the 2025 packs")
  }
}
