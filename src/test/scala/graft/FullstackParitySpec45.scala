package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat

/** Forty-fifth tranche — the remaining delta-merge data-type fixtures:
  *
  *  - `query/data_type/mydatetime/cast.test`: string→MyDateTime at
  *    fsp 0/3/5 (rendering keeps exactly fsp fractional digits),
  *    datetime/date→string, and ConvertTimeZoneFromUTC into
  *    Asia/Shanghai during China's 1991 DST window (+9, not +8 — the
  *    fixture's own "+9 because of DST" comment).
  *  - `query/data_type/mydatetime/compare.test`: MySQL ZERO-DATE
  *    ordering — '1991-00-00 11:11:11' is a real storable value that
  *    sorts before every January-1991 datetime (packed-number
  *    comparison semantics, `DataTypeMyDateTime` packed u64).
  *  - `query/data_type/decimal/pr359.test`: int column + decimal
  *    literal widens to exact decimal (4.141592653, no float detour).
  *  - `query/expr/aggregation_uniq.test`: uniq (distinct count) over
  *    an empty table is 0 (keyless) / no groups (keyed), NULLs don't
  *    count, and the MULTI-ARGUMENT form counts distinct tuples.
  *  - `query/data_type/data_type_time_bit.test`: TIME (Int64 nanos)
  *    renders 1e9 → 00:00:01; bit(1)/bit(24) carry integer payloads.
  */
class FullstackParitySpec45 extends SparkTestBase {
  import spark.implicits._

  test("mydatetime/cast.test: fsp rendering and string round-trips") {
    val t = Seq(("1991-09-05 11:11:11", "1991-09-05")).toDF("a", "b")
      .withColumn("ts", col("a").cast("timestamp"))
      .withColumn("dt", col("b").cast("date"))
    val r = t.select(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("fsp0"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS").as("fsp3"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSS").as("fsp5"),
      col("dt").cast("string").as("ds")).head()
    assert(r.getString(0) === "1991-09-05 11:11:11")
    assert(r.getString(1) === "1991-09-05 11:11:11.000")
    assert(r.getString(2) === "1991-09-05 11:11:11.00000")
    assert(r.getString(3) === "1991-09-05")
    val frac = Seq("1991-09-05 11:11:11.1").toDF("s")
      .select(date_format(col("s").cast("timestamp"),
        "yyyy-MM-dd HH:mm:ss.SSSSS")).head().getString(0)
    assert(frac === "1991-09-05 11:11:11.10000",
      "fsp5 pads the .1 fraction to 5 digits")
  }

  test("mydatetime/cast.test: ConvertTimeZoneFromUTC hits China's 1991 DST (+9)") {
    val got = Seq("1991-09-05 11:11:11.123").toDF("s")
      .select(date_format(
        from_utc_timestamp(col("s").cast("timestamp"), "Asia/Shanghai"),
        "yyyy-MM-dd HH:mm:ss.SSSSS")).head().getString(0)
    assert(got === "1991-09-05 20:11:11.12300",
      "1991-09-05 was inside China's DST window: UTC+9, not the usual +8")
  }

  /** MySQL packed-datetime key: zero months/days are storable and sort
    * by component (the DataTypeMyDateTime packed-u64 order). Strings
    * 'yyyy-MM-dd[ HH:mm:ss[.ffffff]]' → (packed seconds, micros). */
  private def packed(s: Column): Column = {
    val d = regexp_extract(s, "^(\\d{4})-(\\d{2})-(\\d{2})", 0)
    val base = concat(regexp_replace(d, "-", ""),
      lpad(regexp_replace(
        regexp_extract(s, "\\d{2}:\\d{2}:\\d{2}", 0), ":", ""), 6, "0"))
      .cast("long")
    val frac = rpad(coalesce(
      regexp_extract(s, "\\.(\\d+)$", 1), lit("")), 6, "0").cast("long")
    // yyyymmddHHmmss·10^6 + micros exceeds LONG — ride decimal(26,0)
    base.cast("decimal(26,0)") * lit(1000000L) + frac
  }

  test("mydatetime/compare.test: zero-date values sort before real dates by packed order") {
    val rows = Seq("1991-09-05 11:11:11", "1991-09-05 11:11:11.123",
      "1991-00-00 11:11:11", "1992-01-01 11:11:11").toDF("a")
    def sel(cond: Column): Seq[String] =
      rows.filter(cond).collect().map(_.getString(0)).toSeq.sorted
    assert(sel(packed(col("a")) <= packed(lit("1992-01-01"))) ===
      Seq("1991-00-00 11:11:11", "1991-09-05 11:11:11",
        "1991-09-05 11:11:11.123"))
    assert(sel(packed(col("a")) >= packed(lit("1991-01-01"))) ===
      Seq("1991-09-05 11:11:11", "1991-09-05 11:11:11.123",
        "1992-01-01 11:11:11"),
      "the zero-date 1991-00-00 sorts BELOW 1991-01-01")
    assert(sel(packed(col("a")) < packed(lit("1991-09-05 11:11:11"))) ===
      Seq("1991-00-00 11:11:11"))
    assert(sel(packed(col("a")) <= packed(lit("1991-09-05 11:11:11"))) ===
      Seq("1991-00-00 11:11:11", "1991-09-05 11:11:11"))
    assert(sel(packed(col("a")) < packed(lit("1991-09-05 11:11:11.124"))) ===
      Seq("1991-00-00 11:11:11", "1991-09-05 11:11:11",
        "1991-09-05 11:11:11.123"))
  }

  test("decimal/pr359.test: int + decimal literal stays exact decimal") {
    val got = Seq(1).toDF("a")
      .select((col("a") + lit(new java.math.BigDecimal("3.141592653")))
        .cast("string")).head().getString(0)
    assert(got === "4.141592653")
  }

  test("aggregation_uniq.test: uniq over empty/NULL/multi-arg") {
    val empty = Seq.empty[(String, Long, String)].toDF("c1", "c2", "c3")
    assert(empty.groupBy(col("c3")).agg(countDistinct(col("c2"))).count() === 0L,
      "keyed uniq over empty input: no groups")
    assert(empty.agg(countDistinct(col("c2"))).head().getLong(0) === 0L)
    val t = Seq(("test1", 666L, "111"), ("test2", 666L, "222"),
      ("test3", 777L, "222"), ("test3", 777L, "111")).toDF("c1", "c2", "c3")
    assert(t.agg(countDistinct(lit(null))).head().getLong(0) === 0L,
      "uniq(NULL) counts nothing")
    val multi = t.groupBy(col("c2"))
      .agg(countDistinct(col("c1"), col("c2")).as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(multi === Map(666L -> 2L, 777L -> 1L),
      "multi-argument uniq counts distinct (c1, c2) tuples per group")
  }

  test("data_type_time_bit.test: TIME nanos render and bit payloads pass through") {
    val t = Seq((1000000000L, 98, 9572888)).toDF("c1", "c2", "c3")
    val r = t.select(MySqlCompat.mysql_duration_str(col("c1"), 0).as("t"),
      col("c2"), col("c3")).head()
    assert(r.getString(0) === "00:00:01")
    assert(r.getInt(1) === 98 && r.getInt(2) === 9572888)
  }
}
