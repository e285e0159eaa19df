package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Twenty-third tranche: mpp issue-regression + partition-pruning
  * fixtures mirrored verbatim
  * (`/root/reference/tests/fullstack-test/mpp/{issue10045, issue_6808,
  * dynamic_partition_prune, partition_table_with_time}.test` +
  * `tests/fullstack-test/expr/{expr_tree_too_deep, cast_time_as_string,
  * return_warning}.test`). The range-partitioned tables map to
  * Hive-style parquet partitions with TiDB's partition-id derivation
  * done at plan time (the PartitionTableScan "surviving partition ids"
  * contract, `Flash/Coprocessor/TiDBTableScan.cpp`). */
class FullstackParitySpec23 extends SparkTestBase {
  import spark.implicits._

  test("issue10045.test: decimal AVG window does not overflow its narrow source type") {
    // 10 × 2^10 rows of decimal(5,0) 10000 — the regression was the
    // window avg overflowing the unwidened decimal sum
    var t = Seq.fill(10)((1, "10000")).toDF("id", "v")
      .select($"id", $"v".cast("decimal(5,0)").as("value"))
    for (_ <- 1 to 10) t = t.union(t)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val got = t.select($"id", $"value", avg($"value").over(w).as("a")).limit(1)
      .collect().head
    assert(got.getInt(0) === 1)
    assert(got.getDecimal(1).longValueExact === 10000L)
    assert(got.getDecimal(2).compareTo(new java.math.BigDecimal("10000.0000")) === 0)
    assert(t.count() === 10240L)
  }

  test("issue_6808.test: HAVING over the empty global aggregate returns no row, every key type") {
    // four empty tables with int / varchar / double / date clustered PKs
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val got = df.agg(sum(lit(1)).as("c"), count(lit(1)).as("cnt"),
          count($"a").as("cnta"))
        .where($"cnt" > 1 || $"cnta" === lit(null))
        .select($"c")
      assert(got.collect().isEmpty)
    }
    check(Seq.empty[(Option[Int], Int)].toDF("a", "id"))
    check(Seq.empty[(Option[Int], String)].toDF("a", "id"))
    check(Seq.empty[(Option[Int], Double)].toDF("a", "id"))
    check(Seq.empty[(Option[Int], java.sql.Date)].toDF("a", "id"))
  }

  /** TiDB RANGE partition derivation: store_id bounds → surviving
    * partition names, `PARTITION BY RANGE (store_id) (p0 < 6, p1 < 11,
    * p2 < 16, p3 < 21)`. */
  private val ranges = Seq(("p0", Int.MinValue, 6), ("p1", 6, 11),
    ("p2", 11, 16), ("p3", 16, 21))
  private def surviving(lo: Int, hi: Int): Seq[String] =
    ranges.collect { case (p, plo, phi) if plo < hi && lo < phi => p }

  test("dynamic_partition_prune.test: range partitions prune by the store_id predicate") {
    val dir = Files.createTempDirectory("graft-dpp").toString + "/employees"
    val emp = Seq((100, "aa", "2020-01-01", 10, 5), (100, "aa", "2020-01-01", 10, 15),
      (100, "aa", "2020-01-01", 10, 20))
      .toDF("id", "fname", "hired", "job_code", "store_id")
      .withColumn("p",
        when($"store_id" < 6, "p0").when($"store_id" < 11, "p1")
          .when($"store_id" < 16, "p2").otherwise("p3"))
    emp.write.partitionBy("p").parquet(dir)
    val t = spark.read.parquet(dir)

    def prunedCount(lo: Int, hi: Int, pred: org.apache.spark.sql.Column): Long = {
      val parts = surviving(lo, hi)
      val q = t.where($"p".isin(parts: _*) && pred)
      // the scan must list only the surviving partitions
      val scan = q.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      if (parts.nonEmpty) {
        assert(scan.nonEmpty)
        assert(scan.get.selectedPartitions.partitionCount === {
          // only partitions that physically exist in the data can appear
          val present = Seq("p0", "p2", "p3") // store ids 5, 15, 20
          parts.count(present.contains)
        })
      }
      q.count()
    }
    assert(t.count() === 3L)                                       // no prune
    assert(prunedCount(100, Int.MaxValue, $"store_id" > 100) === 0L) // all pruned
    assert(prunedCount(Int.MinValue, 6, $"store_id" < 6) === 1L)     // p0
    assert(prunedCount(7, 11, $"store_id" > 6 && $"store_id" < 11) === 0L) // p1 empty
    assert(prunedCount(Int.MinValue, 11, $"store_id" < 11) === 1L)   // p0+p1
    assert(prunedCount(Int.MinValue, 100, $"store_id" < 100) === 3L) // all kept
  }

  test("partition_table_with_time.test: TIME values read ordered across range partitions") {
    val dir = Files.createTempDirectory("graft-ptt").toString + "/t"
    val t = Seq((1, 111111L), (2, 222222L), (3, 333333L)).toDF("col1", "n")
      .withColumn("p", when($"col1" < 2, "p0").otherwise("p3"))
      // MySQL TIME number 111111 reads as 11:11:11
      .withColumn("col2", format_string("%02d:%02d:%02d",
        ($"n" / 10000L).cast("long"), (($"n" / 100L) % 100L).cast("long"),
        ($"n" % 100L).cast("long")))
    t.write.partitionBy("p").parquet(dir)
    val got = spark.read.parquet(dir).orderBy($"col1")
      .select($"col2").collect().map(_.getString(0)).toSeq
    assert(got === Seq("11:11:11", "22:22:22", "33:33:33"))
  }

  test("expr_tree_too_deep.test: a 101-deep nested CASE plans and filters correctly") {
    val t = Seq((1, -1)).toDF("id", "value")
    // the transcript's filter: CASE nests from value<100 down to value<0;
    // MySQL treats the INT result as truthy — ANSI Spark needs `= 1`
    val deep = (0 to 100).foldLeft("1") { (inner, k) =>
      s"case when value < $k then $inner end"
    } + " = 1"
    val got = t.where(expr(deep)).collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got === Seq((1, -1)))
    // and a non-matching row is filtered, not errored
    assert(Seq((2, 50)).toDF("id", "value").where(expr(deep)).collect().isEmpty)
  }

  test("cast_time_as_string.test: fsp-scaled rendering in group keys and filters") {
    import graft.functions.MySqlCompat._
    val t = Seq("2021-04-13 00:34:00.123456").toDF("raw")
      .select(
        // datetime (fsp 0) rounds the fraction away
        date_format(mysql_datetime_round($"raw".cast("timestamp"), 0),
          "yyyy-MM-dd HH:mm:ss").as("a"),
        date_format($"raw".cast("date").cast("timestamp"), "yyyy-MM-dd").as("b"),
        // timestamp(3) keeps (rounded) milliseconds
        date_format(mysql_datetime_round($"raw".cast("timestamp"), 3),
          "yyyy-MM-dd HH:mm:ss.SSS").as("c"))
    val grouped = t.groupBy($"a", $"b", $"c").agg(count(lit(1)).as("n"))
      .collect().head
    assert(grouped.getString(0) === "2021-04-13 00:34:00")
    assert(grouped.getString(1) === "2021-04-13")
    assert(grouped.getString(2) === "2021-04-13 00:34:00.123")
    assert(grouped.getLong(3) === 1L)
    assert(t.where($"a" === "2021-04-13 00:34:00" && $"b" === "2021-04-13"
      && $"c" === "2021-04-13 00:34:00.123").count() === 1L)
  }

  test("return_warning.test: lax numeric→datetime cast filters falsy/invalid, keeps valid") {
    import graft.functions.MySqlCompat._
    val t = Seq(1, 20201212).toDF("a")
    // MySQL: cast(1 as datetime) is invalid → NULL (with a warning) →
    // filtered; 20201212 parses as 2020-12-12 → truthy
    val got = t.where(mysql_number_to_datetime($"a", 0).isNotNull)
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(20201212))
  }
}
