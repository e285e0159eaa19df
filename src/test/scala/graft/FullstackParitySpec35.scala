package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.MySqlCompat
import graft.streaming.Ingest

/** Thirty-fifth tranche: issue-regression fixtures mirrored
  * (`/root/reference/tests/fullstack-test/issues/issue_10809_int_decimal
  * .test`, `issues/issue_10809_varchar.test`, `issues/issue_8111.test`,
  * `issues/issue_8113.test`, `issues/issue_1962.test`,
  * `issues/issue_2471.test`, `issues/issue_3373.test`,
  * `issues/issue_3447.test`): compaction over all-NULL / all-empty
  * columns, decimal UNION ALL aggregation over empty inputs, MySQL
  * numeric truthiness of strings and LOG(false), broadcast
  * nested-loop (cartesian) non-equi left joins, and the empty-input
  * keyless aggregate under HAVING + NOT IN.
  */
class FullstackParitySpec35 extends SparkTestBase {
  import spark.implicits._

  test("issue_10809: compaction over all-NULL int/decimal/varchar columns") {
    // 128 live rows whose payload column is entirely NULL (then
    // entirely empty-string) must survive the MVCC compact path
    def changelog(v: org.apache.spark.sql.Column) =
      spark.range(1, 129).select(
        col("id").as("user_id"), col("id").as("version"),
        lit(false).as("delmark"), v.as("v"))
    for (nullCol <- Seq(
        lit(null).cast("int"), lit(null).cast("decimal(20,6)"),
        lit(null).cast("string"))) {
      val compacted = Ingest.compact(changelog(nullCol))
      val r = compacted.agg(count(lit(1)), count(col("v"))).head()
      assert(r.getLong(0) === 128L && r.getLong(1) === 0L,
        s"count(*)=128, count(v)=0 for all-NULL ${nullCol}")
    }
    // all-empty varchar: 128 rows, sum(length(v)) = 0
    val empties = Ingest.compact(changelog(lit("")))
    val r = empties.agg(count(lit(1)), sum(length(col("v")))).head()
    assert(r.getLong(0) === 128L && r.getLong(1) === 0L)
  }

  test("issue_8111: decimal UNION ALL grouped aggregate over empty inputs is empty") {
    val t1 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("store_no", StringType, false),
        StructField("amount", DecimalType(8, 2), false))))
    val t2 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("year_month", DateType, false),
        StructField("amount", DecimalType(8, 2), false))))
    t1.createOrReplaceTempView("it8111_t1")
    t2.createOrReplaceTempView("it8111_t2")
    val out = spark.sql(
      """SELECT SUM(col2) FROM (
        |  SELECT SUM(amount) AS col1, 0.0 AS col2 FROM it8111_t1 GROUP BY store_no
        |  UNION ALL SELECT 0.0 AS col1, 0.0 AS col2 FROM it8111_t2 WHERE amount = 1
        |  UNION ALL SELECT 0.0 AS col1, amount AS col2 FROM it8111_t2
        |    WHERE `year_month` = '2023-09-12'
        |) temp GROUP BY col1""".stripMargin)
    assert(out.isEmpty, "all three union legs are empty and GROUP BY emits no groups")
  }

  test("issue_8113: WHERE LOG(false) filters everything (log of 0 is NULL)") {
    val t0 = Seq(false).toDF("c0")
    // MySQL: LOG(0) → NULL → WHERE NULL drops the row; Spark's non-ANSI
    // log returns NULL for non-positive input, the same 3VL outcome
    assert(t0.where(log(col("c0").cast("double")).isNotNull).isEmpty)
    assert(t0.select(log(col("c0").cast("double"))).head().isNullAt(0))
  }

  test("issue_1962/issue_2471: broadcast cartesian LEFT join — non-equi misses, equi hits") {
    val a = Seq((0, 1, "a"), (1, 2, "b")).toDF("pk", "id", "value")
    // non-equi: t1.id > 10 * t2.id never true → every left row
    // null-extends, via a nested-loop (cartesian-capable) join
    val nonEqui = a.as("t1").join(broadcast(a.as("t2")),
      $"t1.id" > lit(10) * $"t2.id", "left")
    val rows = nonEqui.select($"t1.pk", $"t1.id", $"t1.value", $"t2.pk")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.get(3)))
    assert(rows.toSet === Set((0, 1, "a", null), (1, 2, "b", null)))
    nonEqui.collect()
    val plan = nonEqui.queryExecution.executedPlan match {
      case ad: AdaptiveSparkPlanExec => ad.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi left join must run as nested-loop broadcast:\n$plan")
    // the equi self-join of the same fixture matches both rows
    val equi = a.as("t1").join(a.as("t2"), $"t1.id" === $"t2.id", "left")
      .select($"t1.pk", $"t2.pk")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(equi === Set((0, 0), (1, 1)))
  }

  test("issue_3373: keyless SUM over empty input + HAVING NOT IN empty subquery keeps the NULL row") {
    val t = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("a", IntegerType))))
    val t2 = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("a", DoubleType), StructField("b", FloatType))))
    t.createOrReplaceTempView("it3373_t")
    t2.createOrReplaceTempView("it3373_t2")
    val out = spark.sql(
      """SELECT sum(a) AS x FROM it3373_t
        |HAVING x NOT IN (SELECT b FROM it3373_t2 WHERE x IN (b))"""
        .stripMargin).collect()
    // keyless agg over empty input emits ONE row (x = NULL); NOT IN
    // over the empty subquery is TRUE, so the row survives
    assert(out.length === 1 && out(0).isNullAt(0))
  }

  test("issue_3447: MySQL string truthiness in WHERE (leading-numeric parse)") {
    val t = Seq("0.1", "-0.1", "0.0", "-1", "a0.1", "0x01").toDF("a")
    // MySQL: WHERE a coerces the string with the lax leading-numeric
    // parse — 'a0.1' and '0x01' parse to 0 (hex literals are NOT
    // recognized in string context), '0.0' is falsy
    val kept = t.where(MySqlCompat.mysql_cast_real(col("a")) =!= 0.0)
      .collect().map(_.getString(0)).toSet
    assert(kept === Set("0.1", "-0.1", "-1"))
  }
}
