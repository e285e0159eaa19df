package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Twenty-fifth tranche: delta-merge misc + variables fixtures
  * mirrored (`/root/reference/tests/delta-merge-test/query/misc/
  * timestamp_rough_set_filter.test`,
  * `tests/fullstack-test2/variables/set_variable_div_precision_increment
  * .test`, `tests/fullstack-test2/dml/text_blob_type.test`,
  * `delta-merge-test/query/mpp/decimal_hash.test` family): rough-set
  * (row-group min/max) pruning on a TIMESTAMP column incl. the
  * tz-shifted-literal equivalence, MySQL's div_precision_increment
  * decimal-division scale rule, TEXT/BLOB round-trip, and hash
  * partitioning on DECIMAL keys. */
class FullstackParitySpec25 extends SparkTestBase {
  import spark.implicits._

  test("timestamp_rough_set_filter.test: the 6-row boundary semantics + tz-shifted literal") {
    val rows = Seq(
      (50L, "2019-06-10 09:00:00"), (51L, "2019-06-11 07:00:00"),
      (52L, "2019-06-12 08:00:00"), (53L, "2019-06-11 08:00:00"),
      (54L, "2019-06-13 09:00:01"), (55L, "2019-06-13 12:00:01"))
    val t = rows.toDF("col_1", "s").withColumn("col_2", $"s".cast("timestamp"))
    assert(t.count() === 6L)
    // strict < of the minimum excludes everything (exclude rate 100.00)
    assert(t.where($"col_2" < "2019-06-10 09:00:00").count() === 0L)
    // <= of the minimum keeps exactly the boundary row
    val kept = t.where($"col_2" <= "2019-06-10 09:00:00")
      .select($"col_1").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(50L))
    // tz_offset 28800: the +08:00 wall-clock literal denotes the same
    // instant, so the same rows survive
    val kept8 = t.where($"col_2" <= to_utc_timestamp(lit("2019-06-10 17:00:00"), "+08:00"))
      .select($"col_1").collect().map(_.getLong(0)).toSeq
    assert(kept8 === Seq(50L))
    assert(t.where($"col_2" < to_utc_timestamp(lit("2019-06-10 17:00:00"), "+08:00"))
      .count() === 0L)
  }

  test("timestamp_rough_set_filter.test: row-group min/max skips timestamp packs (exclude-rate analog)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = Files.createTempDirectory("graft-tsrsf").toString + "/t"
    val total = 200000L
    // one year of second-spaced timestamps, sorted → tight per-row-group
    // min/max on the ts column (≙ the pack min-max index)
    spark.range(0, total)
      .select(col("id"),
        timestamp_seconds(lit(1560150000L) + col("id") * 60).as("ts"))
      .orderBy(col("ts")).coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("ts") < timestamp_seconds(lit(1560150000L + 600)))
    assert(q.count() === 10L)
    val executed = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val scan = executed.collectLeaves().collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.metadata("PushedFilters").contains("LessThan(ts,"),
      s"timestamp range must reach the parquet reader: ${scan.metadata("PushedFilters")}")
    val emitted = scan.metrics("numOutputRows").value
    assert(emitted < total / 10,
      s"scan emitted $emitted of $total rows — timestamp row-group stats not skipping")
  }

  test("set_variable_div_precision_increment.test: MySQL decimal division scale = scale(a) + increment") {
    import graft.functions.MySqlCompat.mysql_div
    val t = Seq("11.2", "10.1", "13.7").toDF("s")
      .select($"s".cast("decimal(3,1)").as("a"), lit(3).cast("decimal(3,0)").as("b"))
    // default increment 4: scale(a)=1 → result scale 5
    val div4 = t.select(mysql_div($"a", $"b", scaleA = 1).cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(div4 === Seq("3.73333", "3.36667", "4.56667"))
    // avg = sum/count under the same rule
    val avg4 = t.agg(mysql_div(sum($"a"), count(lit(1)), scaleA = 1).cast("string"))
      .collect().head.getString(0)
    assert(avg4 === "11.66667")
    // increment 5 → scale 6
    val div5 = t.select(mysql_div($"a", $"b", scaleA = 1, inc = 5).cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(div5 === Seq("3.733333", "3.366667", "4.566667"))
    val avg5 = t.agg(mysql_div(sum($"a"), count(lit(1)), scaleA = 1, inc = 5).cast("string"))
      .collect().head.getString(0)
    assert(avg5 === "11.666667")
  }

  test("text_blob_type.test: TEXT and BLOB columns round-trip through the scan") {
    val dir = Files.createTempDirectory("graft-blob").toString + "/t"
    Seq(("test1", "01223".getBytes("UTF-8"))).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir).collect().head
    assert(got.getString(0) === "test1")
    assert(new String(got.getAs[Array[Byte]](1), "UTF-8") === "01223")
  }

  test("decimal_hash.test family: hash partitioning on DECIMAL keys groups and joins exactly") {
    // ≙ delta-merge-test/query/mpp/decimal_hash.test — shuffling on a
    // decimal key must hash equal values identically across partitions
    val t = spark.range(0, 10000)
      .select((col("id") % 97).cast("decimal(20,2)").as("k"), col("id"))
      .repartition(32, col("k"))
    val grouped = t.groupBy($"k").agg(count(lit(1)).as("n"))
    assert(grouped.count() === 97L)
    assert(grouped.agg(sum($"n")).collect().head.getLong(0) === 10000L)
    // self-join on the decimal key: every row matches its group size
    val joined = t.join(grouped, "k")
    assert(joined.count() === 10000L)
    assert(joined.where($"n" =!= lit(10000L / 97 + 1) && $"n" =!= lit(10000L / 97))
      .count() === 0L)
  }
}
