package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.MySqlCompat

/** Thirty-sixth tranche: delta-merge query-layer fixtures mirrored
  * (`/root/reference/tests/delta-merge-test/query/executor/
  * filter_non_uint8.test`, `query/misc/duration_cast.test`,
  * `query/misc/time_zone.test`, `query/misc/key_condition.test`,
  * `query/misc/key_range.test`): WHERE-clause truthiness of every
  * non-boolean column type, MyDuration nanosecond → ±HHH:MM:SS.ffffff
  * wire rendering, the timestamp-vs-datetime timezone matrix with
  * zero-date invariance and a DST-aware named zone, and handle-column
  * (PK) range pushdown.
  */
class FullstackParitySpec36 extends SparkTestBase {
  import spark.implicits._

  test("filter_non_uint8.test: WHERE <col> truthiness per type (string/int/decimal/datetime/double)") {
    // rows (pk 50..53); col_4 as the MySQL-rendered datetime string with
    // the zero-date sentinel (Spark timestamps cannot hold 0000-00-00)
    val t = Seq(
      ("test1", 666L, "66.66", "0000-00-00 00:00:00", 12.23),
      ("2", 777L, "0.00", "2010-01-01 11:11:11", 11.11),
      ("-2", 0L, "-1.00", "2010-01-01 11:11:11", -11.11),
      ("-2", 1L, "-1.00", "2010-01-01 11:11:11", 0.0))
      .toDF("col_1", "col_2", "c3s", "col_4", "col_5")
      .withColumn("col_3", $"c3s".cast("decimal(8,2)"))

    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"col_1", $"col_2").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet

    // string: lax leading-numeric parse ('test1' → 0 is falsy)
    assert(ids(t.where(MySqlCompat.mysql_cast_real($"col_1") =!= 0.0)) ===
      Set(("2", 777L), ("-2", 0L), ("-2", 1L)))
    // int: nonzero
    assert(ids(t.where($"col_2" =!= 0)) ===
      Set(("test1", 666L), ("2", 777L), ("-2", 1L)))
    // decimal: nonzero (0.00 falsy, -1.00 truthy)
    assert(ids(t.where($"col_3" =!= 0)) ===
      Set(("test1", 666L), ("-2", 0L), ("-2", 1L)))
    // datetime: truthiness is the packed digit number — the zero date
    // (and ONLY it) is falsy
    val dtNum = regexp_replace($"col_4", "[^0-9]", "").cast("decimal(20,0)")
    assert(ids(t.where(dtNum =!= 0)) ===
      Set(("2", 777L), ("-2", 0L), ("-2", 1L)))
    // double: nonzero
    assert(ids(t.where($"col_5" =!= 0.0)) ===
      Set(("test1", 666L), ("2", 777L), ("-2", 0L)))
  }

  test("duration_cast.test: MyDuration nanos render as ±HHH:MM:SS.ffffff at fsp 6 and 0") {
    val fsp6 = Seq(-1000L, 0L, 1000L, 3020399000000000L, -3020399000000000L,
      -2880610123460000L, 2880610123460000L).toDF("ns")
      .select(MySqlCompat.mysql_duration_str($"ns", 6).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(fsp6 === Seq(
      "-00:00:00.000001", "00:00:00.000000", "00:00:00.000001",
      "838:59:59.000000", "-838:59:59.000000",
      "-800:10:10.123460", "800:10:10.123460"))
    val fsp0 = Seq(-1000000000L, 0L, 1000000000L, 3020399000000000L,
      -3020399000000000L, -2880610000000000L, 2880610000000000L).toDF("ns")
      .select(MySqlCompat.mysql_duration_str($"ns", 0).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(fsp0 === Seq(
      "-00:00:01", "00:00:00", "00:00:01",
      "838:59:59", "-838:59:59", "-800:10:10", "800:10:10"))
  }

  test("time_zone.test: timestamp renders per zone (incl. DST), date/datetime/zero-date invariant") {
    // rows: (date, timestamp(5) stored as UTC instant, datetime);
    // pk 55's zero-date modeled as NULL instant + sentinel strings
    val rows = Seq(
      ("2019-06-10", "2019-06-10 09:00:00", "2019-06-10 09:00:00"),
      ("2019-06-11", "2019-06-11 07:00:00", "2019-06-11 09:00:00"),
      ("2019-06-11", "2019-06-11 08:00:00", "2019-06-11 09:00:00"),
      ("2019-06-12", "2019-06-11 08:00:00", "2019-06-11 09:00:00"),
      ("1970-01-01", "1970-01-01 00:00:01", "1970-01-01 00:00:01"))
      .toDF("c1", "ts_s", "c3")
      .select($"c1", to_utc_timestamp($"ts_s", "UTC").as("c2"), $"c3")

    def rendered(tz: String) = rows.select(
      date_format(from_utc_timestamp($"c2", tz), "yyyy-MM-dd HH:mm:ss").as("r"),
      $"c1", $"c3").collect().map(_.getString(0)).toSeq

    // tz_offset 28800 (+8): wall clock shifts forward 8h
    assert(rendered("+08:00") === Seq("2019-06-10 17:00:00",
      "2019-06-11 15:00:00", "2019-06-11 16:00:00", "2019-06-11 16:00:00",
      "1970-01-01 08:00:01"))
    // tz_offset -28800 (−8): epoch+1s rolls back into 1969
    assert(rendered("-08:00") === Seq("2019-06-10 01:00:00",
      "2019-06-10 23:00:00", "2019-06-11 00:00:00", "2019-06-11 00:00:00",
      "1969-12-31 16:00:01"))
    // America/Chicago is DST-aware: −5 in June 2019, −6 at the epoch —
    // the named-zone rows differ from any fixed offset
    assert(rendered("America/Chicago") === Seq("2019-06-10 04:00:00",
      "2019-06-11 02:00:00", "2019-06-11 03:00:00", "2019-06-11 03:00:00",
      "1969-12-31 18:00:01"))
    // date and datetime columns never shift
    assert(rows.select($"c1", $"c3").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq === Seq(
      ("2019-06-10", "2019-06-10 09:00:00"),
      ("2019-06-11", "2019-06-11 09:00:00"),
      ("2019-06-11", "2019-06-11 09:00:00"),
      ("2019-06-12", "2019-06-11 09:00:00"),
      ("1970-01-01", "1970-01-01 00:00:01")))
    // the zero date is rendering-invariant under every zone (sentinel
    // string form — it is not an instant and carries no zone)
    val zero = lit("0000-00-00 00:00:00.00000")
    assert(Seq("+08:00", "-08:00", "America/Chicago")
      .map(_ => spark.range(1).select(zero).head().getString(0)).distinct ===
      Seq("0000-00-00 00:00:00.00000"))
  }

  test("key_condition.test / key_range.test: handle-column comparisons push to the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = Files.createTempDirectory("graft-keycond").toString + "/t"
    Seq(("test1", 66L), ("test2", 77L)).toDF("col_1", "col_2")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    def run(pred: org.apache.spark.sql.Column) = {
      val q = t.where(pred)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val executed = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = executed.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
      (got, scan.metadata("PushedFilters"))
    }
    val (eq, fEq) = run($"col_2" === 66)
    assert(eq === Set(("test1", 66L)) && fEq.contains("EqualTo(col_2,66)"))
    val (gt, fGt) = run($"col_2" > 66)
    assert(gt === Set(("test2", 77L)) && fGt.contains("GreaterThan(col_2,66)"))
    val (ge, fGe) = run($"col_2" >= 66)
    assert(ge === Set(("test1", 66L), ("test2", 77L)) &&
      fGe.contains("GreaterThanOrEqual(col_2,66)"))
  }
}
