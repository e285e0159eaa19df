package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Eighteenth tranche of reference fullstack transcripts mirrored
  * verbatim (`/root/reference/tests/fullstack-test/expr/{date_add,
  * date_sub}.test`): fractional numeric INTERVAL values round
  * half-away to whole days (1.4 → 1, 1.6 → 2, double/float/decimal all
  * agree), DATE_SUB with column intervals across the Feb-29 leap
  * boundary (the grouped multiset and the filter forms), compact
  * numeric datetime strings with a microsecond fraction surviving
  * day arithmetic, and the year-9999 range clamp to NULL. */
class FullstackParitySpec18 extends SparkTestBase {
  import spark.implicits._

  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  test("date_add/date_sub: fractional numeric intervals round half-away to days") {
    // t4/t1 fixture verbatim: 1.4 rounds to 1 day, 1.6 to 2 days, and
    // double/float/decimal interval types agree exactly
    val t = Seq(("2020-12-12 12:12:12", 1.4d, 1.4f, new java.math.BigDecimal("1.40")),
        ("2020-12-12 12:12:12", 1.6d, 1.6f, new java.math.BigDecimal("1.60")))
      .toDF("s", "col_double", "col_float", "col_decimal")
      .select(to_timestamp($"s").as("ts"), $"col_double", $"col_float", $"col_decimal")
    def addDays(n: org.apache.spark.sql.Column) =
      expr("timestampadd(DAY, cast(round(n_) as int), ts)")
    val added = t
      .withColumn("n_", round($"col_double").cast("int"))
      .withColumn("add_d", expr("timestampadd(DAY, n_, ts)"))
      .withColumn("n_f", round($"col_float").cast("int"))
      .withColumn("add_f", expr("timestampadd(DAY, n_f, ts)"))
      .withColumn("n_dec", round($"col_decimal").cast("int"))
      .withColumn("add_dec", expr("timestampadd(DAY, n_dec, ts)"))
      .select(fmt($"add_d"), fmt($"add_f"), fmt($"add_dec"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(added.toSeq === Seq(
      ("2020-12-13 12:12:12", "2020-12-13 12:12:12", "2020-12-13 12:12:12"),
      ("2020-12-14 12:12:12", "2020-12-14 12:12:12", "2020-12-14 12:12:12")))
    val subbed = t
      .withColumn("n_", round($"col_double").cast("int"))
      .select(fmt(expr("timestampadd(DAY, -n_, ts)")))
      .collect().map(_.getString(0))
    assert(subbed.toSeq === Seq("2020-12-11 12:12:12", "2020-12-10 12:12:12"))
  }

  test("date_sub.test: column DAY intervals over the leap boundary (grouped multiset)") {
    // the 12 t-fixture rows verbatim
    val rows = Seq(
      (Some("2021-02-28 23:59:59"), Some("2021-03-01"), Some(1)),
      (Some("2021-03-01"), Some("2021-02-28 23:59:59"), Some(2)),
      (Some("2021-03-01"), Some("2021-03-01"), Some(3)),
      (Some("2021-03-01"), Some("2020-02-28"), Some(4)),
      (Some("2020-03-01"), Some("2020-02-28"), Some(5)),
      (Some("2020-02-28 23:59:59"), Some("2020-03-01"), Some(6)),
      (Some("2020-03-01"), Some("2020-02-28 23:59:59"), Some(7)),
      (Some("2021-03-01"), Some("2021-03-01"), Some(8)),
      (Some("2020-02-28"), Some("2021-03-01"), None),
      (Some("2020-02-28"), Some("2020-03-01"), Some(10)),
      (None, Some("2020-03-01"), Some(10)),
      (Some("2020-02-28"), None, None))
    val t = rows.toDF("a_s", "b_s", "c")
      .select(to_timestamp($"a_s").as("a"), $"b_s".as("b"), $"c")
    val dayGroups = t
      .groupBy(fmt(expr("timestampadd(DAY, -c, a)")).as("d"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(dayGroups === Map(
      "2020-02-23 00:00:00" -> 1L, "2021-02-21 00:00:00" -> 1L,
      "2021-02-26 00:00:00" -> 1L, "2021-02-27 00:00:00" -> 1L,
      "2021-02-27 23:59:59" -> 1L, "2021-02-25 00:00:00" -> 1L,
      "2020-02-22 23:59:59" -> 1L, "2020-02-25 00:00:00" -> 1L,
      (null: String) -> 3L, "2020-02-18 00:00:00" -> 1L))
    // SECOND intervals walk back across Feb 29 on the leap year only
    val secGroups = t
      .groupBy(fmt(expr("timestampadd(SECOND, -c, to_timestamp(b))")).as("d"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(secGroups === Map(
      "2020-02-29 23:59:54" -> 1L, "2021-02-28 23:59:57" -> 2L,
      "2020-02-27 23:59:56" -> 1L, "2021-02-28 23:59:52" -> 1L,
      "2020-02-28 23:59:52" -> 1L, (null: String) -> 2L,
      "2021-02-28 23:59:59" -> 1L, "2020-02-27 23:59:55" -> 1L,
      "2020-02-29 23:59:50" -> 2L))
    // the filter forms verbatim
    def cnt(v: String) = t.filter(
      fmt(expr("timestampadd(SECOND, -c, to_timestamp(b))")) === v).count()
    assert(cnt("2020-02-29 23:59:54") === 1L)
    assert(cnt("2020-02-27 23:59:56") === 1L)
    assert(cnt("2021-02-28 23:59:52") === 1L)
  }

  test("date_add.test: compact numeric strings keep their microsecond fraction through day arithmetic") {
    // t3 fixture verbatim: '20121212121212' + 1 day, '20121212' + 9999
    // days, '20121212121212.123456' + 10 days (fraction survives)
    val t = Seq(("20121212121212", 1), ("20121212", 9999),
        ("20121212121212.123456", 10))
      .toDF("col_string", "col_int")
      .withColumn("ts", mysql_number_to_datetime($"col_string".cast("decimal(26,6)"), 6))
    val got = t.select($"col_string",
        expr("timestampadd(DAY, col_int, ts)").as("r"))
      .withColumn("out",
        when(expr("unix_micros(r) % 1000000") === 0L, fmt($"r"))
          .otherwise(date_format($"r", "yyyy-MM-dd HH:mm:ss.SSSSSS")))
      .select($"col_string", $"out")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("20121212121212") === "2012-12-13 12:12:12")
    assert(got("20121212") === "2040-04-28 00:00:00")
    assert(got("20121212121212.123456") === "2012-12-22 12:12:12.123456")
    // the constant-input form: every row computes the same timestamp
    val one = Seq("20121212121212.123456").toDF("s")
      .select(mysql_number_to_datetime($"s".cast("decimal(26,6)"), 6).as("ts2"))
      .select(date_format(expr("timestampadd(DAY, 1, ts2)"),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect().head.getString(0)
    assert(one === "2012-12-13 12:12:12.123456")
  }

  test("date_add.test: results past year 9999 clamp to NULL (MySQL range contract)") {
    // DATE_ADD('2012-12-12', INTERVAL 9999 year) overflows the DATETIME
    // range — the reference returns NULL; a +5 year add stays in range
    // (the transcript's surviving case). The mirrored guard makes the
    // same year-9999 clamp explicit.
    val t = Seq(("2012-12-12", 9999), ("2012-12-12", 5)).toDF("s", "n")
      .select(to_timestamp($"s").as("ts"), $"n")
    val guarded = t.select(
        when(year(expr("timestampadd(YEAR, n, ts)")) > 9999, lit(null))
          .otherwise(fmt(expr("timestampadd(YEAR, n, ts)"))).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(guarded.toSeq === Seq(null, "2017-12-12 00:00:00"))
  }
}
