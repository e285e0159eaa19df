package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Fifteenth tranche of reference fullstack transcripts mirrored
  * verbatim (`/root/reference/tests/fullstack-test/expr/<name>.test`):
  * DATE() coercion from strings/datetimes/compact integers
  * (date.test), DAYOFMONTH over invalid strings (day_of_month.test),
  * the GET_FORMAT type×locale matrix (get_format.test), YEAR/MONTH/DAY
  * extraction under shifted session time zones — instant-typed
  * timestamp columns shift, wall-clock datetime/date columns don't
  * (year-month-day.test), the IS_IPV4/IS_IPV6 validity matrix
  * (is_ip_addr.test), bitwise NOT/AND/OR/XOR as filter predicates
  * (bitwise_operator.test), DATE and TIMESTAMP literals with time-zone
  * display (datetime_literal.test, timestamp_literal.test), and a
  * RIGHT JOIN on an inequality with a self-matching single row
  * (enum.test). */
class FullstackParitySpec15 extends SparkTestBase {
  import spark.implicits._

  test("date.test: col_date compared against DATE() of string and datetime columns") {
    // the two fixture rows verbatim
    val t = Seq(
      ("2006-10-11", "2007-10-11 10:10:10", "2006-10-11 10:10:10"),
      ("2006-10-11", "2006-10-11 10:10:10", "2007-10-11 10:10:10"))
      .toDF("col_date_s", "col_datetime_s", "col_string")
      .select($"col_date_s".cast("date").as("col_date"),
        to_timestamp($"col_datetime_s").as("col_datetime"), $"col_string")
    def strings(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(date_format($"col_datetime", "yyyy-MM-dd HH:mm:ss"))
        .collect().map(_.getString(0)).toSeq
    assert(strings(t.filter($"col_date" === mysql_lax_date($"col_string")))
      === Seq("2007-10-11 10:10:10"))
    assert(strings(t.filter($"col_date" < mysql_lax_date($"col_string")))
      === Seq("2006-10-11 10:10:10"))
    assert(strings(t.filter($"col_date" === $"col_datetime".cast("date")))
      === Seq("2006-10-11 10:10:10"))
    assert(strings(t.filter($"col_date" < $"col_datetime".cast("date")))
      === Seq("2007-10-11 10:10:10"))
  }

  test("date.test: DATE(bigint) parses compact 6/8/12/14-digit forms, else NULL") {
    // the ten t1 fixture values verbatim: yyMMdd/yyyyMMdd(+HHmmss)
    // compact forms parse, everything else (0, 1, -1, negatives, month
    // 99) is NULL
    val expected = Seq(
      0L -> null, 1L -> null, -1L -> null,
      111111L -> "2011-11-11",
      11111111111111L -> "1111-11-11",
      20201212L -> "2020-12-12",
      20201212111111L -> "2020-12-12",
      -20201212L -> null, -20201212111111L -> null,
      99999999999999L -> null)
    val got = expected.map(_._1).toDF("col_int")
      .select($"col_int",
        mysql_number_to_datetime($"col_int", 0).cast("date").cast("string").as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    expected.foreach { case (in, want) =>
      assert(got(in) === want, s"date($in)")
    }
  }

  test("day_of_month.test: invalid date strings give NULL, valid give the day") {
    // dayofmonth(''), dayofmonth('1'), dayofmonth('1999-30-01'),
    // dayofmonth(null) → all NULL; the c_str fixture column yields
    // NULL,NULL,NULL,10
    val bad = Seq("", "1", "1999-30-01", null)
    val badGot = bad.toDF("s")
      .select(dayofmonth(mysql_lax_date_compact($"s"))).collect()
    assert(badGot.forall(_.isNullAt(0)), "invalid inputs must all be NULL")
    val fixture = Seq("" -> null, "200" -> null, "1999-30-10" -> null,
      "1999-01-10" -> Integer.valueOf(10))
    val got = fixture.map(_._1).toDF("c_str")
      .select($"c_str", dayofmonth(mysql_lax_date_compact($"c_str")))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else Integer.valueOf(r.getInt(1)))).toMap
    fixture.foreach { case (in, want) => assert(got(in) === want, s"dayofmonth('$in')") }
  }

  test("get_format.test: the full type x locale matrix") {
    val locs = Seq("USA", "JIS", "ISO", "EUR", "INTERNAL")
    assert(locs.map(getFormat("DATE", _)) ===
      Seq("%m.%d.%Y", "%Y-%m-%d", "%Y-%m-%d", "%d.%m.%Y", "%Y%m%d"))
    assert(locs.map(getFormat("DATETIME", _)) ===
      Seq("%Y-%m-%d %H.%i.%s", "%Y-%m-%d %H:%i:%s", "%Y-%m-%d %H:%i:%s",
        "%Y-%m-%d %H.%i.%s", "%Y%m%d%H%i%s"))
    assert(locs.map(getFormat("TIMESTAMP", _)) ===
      Seq("%Y-%m-%d %H.%i.%s", "%Y-%m-%d %H:%i:%s", "%Y-%m-%d %H:%i:%s",
        "%Y-%m-%d %H.%i.%s", "%Y%m%d%H%i%s"))
    assert(locs.map(getFormat("TIME", _)) ===
      Seq("%h:%i:%s %p", "%H:%i:%s", "%H:%i:%s", "%H.%i.%s", "%H%i%s"))
  }

  test("year-month-day.test: timestamp columns shift with the session tz, datetime/date don't") {
    // fixture rows '2020-01-01 00:00:01' and '2021-12-31 23:59:59'
    // (inserted under UTC) + a NULL row. a/b are wall-clock types —
    // extraction is tz-independent; c is an instant — under +01:00 the
    // second row becomes 2022-01-01, under -01:00 the first becomes
    // 2019-12-31.
    val t = Seq(Some("2020-01-01 00:00:01"), Some("2021-12-31 23:59:59"), None)
      .toDF("s")
      .select(to_timestamp($"s").as("a"), $"s".cast("date").as("b"),
        to_timestamp($"s").as("c"))
    def ymd(c: org.apache.spark.sql.Column) = Seq(year(c), month(c), dayofmonth(c))
    def matrix(tz: String): Set[Seq[Any]] =
      t.select((ymd($"a") ++ ymd($"b") ++
        ymd(from_utc_timestamp($"c", tz))): _*)
        .collect().map(_.toSeq).toSet
    assert(matrix("+01:00") === Set(
      Seq(2020, 1, 1, 2020, 1, 1, 2020, 1, 1),
      Seq(2021, 12, 31, 2021, 12, 31, 2022, 1, 1),
      Seq(null, null, null, null, null, null, null, null, null)))
    assert(matrix("-01:00") === Set(
      Seq(2020, 1, 1, 2020, 1, 1, 2019, 12, 31),
      Seq(2021, 12, 31, 2021, 12, 31, 2021, 12, 31),
      Seq(null, null, null, null, null, null, null, null, null)))
    // the filter forms verbatim
    assert(t.filter(year(from_utc_timestamp($"c", "-01:00")) === 2019).count() === 1L)
    assert(t.filter(year(from_utc_timestamp($"c", "+01:00")) === 2022).count() === 1L)
    assert(t.filter(month(from_utc_timestamp($"c", "-01:00")) === 12).count() === 2L)
    assert(t.filter(month(from_utc_timestamp($"c", "+01:00")).isNull).count() === 1L)
    assert(t.filter(dayofmonth(from_utc_timestamp($"c", "-01:00")) === 31).count() === 2L)
    assert(t.filter(dayofmonth(from_utc_timestamp($"c", "+01:00")) === 1).count() === 2L)
  }

  test("is_ip_addr.test: the 14-row IPv4/IPv6 validity matrix") {
    val rows = Seq(
      ("123.123.123.123", "F746:C349:48E3:22F2:81E0:0EA8:E7B6:8286", 1, 1),
      ("0.0.0.0", "0000:0000:0000:0000:0000:0000:0000:0000", 1, 1),
      ("127.0.0.1", "2001:0:2851:b9f0:6d:2326:9036:f37a", 1, 1),
      ("192.168.0.0/10", "fe80::2dc3:25a5:49a1:6002%24", 0, 0),
      ("192.168.99.22.123", "4207:A33A:58D3:F2C3:8EDC:A548:3EC7:0D00:0D00", 0, 0),
      ("999.999.999.999", "4207:A33A:58D3:F2C3:8EDC:A548::0D00", 0, 1),
      ("3.2.1.", "4207::::8EDC:A548:3EC7:0D00", 0, 0),
      ("3..2.1", "4207:::::A548:3EC7:0D00", 0, 0),
      ("...", "::::::", 0, 0),
      ("4556456", "4556456", 0, 0),
      ("ajdjioa", "ajdjioa", 0, 0),
      ("", "", 0, 0))
    val got = rows.map(r => (r._1, r._2)).toDF("v4", "v6")
      .select($"v4", is_ipv4($"v4").cast("int").as("i4"),
        is_ipv6($"v6").cast("int").as("i6"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    rows.zip(got).foreach { case ((v4, v6, e4, e6), (_, g4, g6)) =>
      assert(g4 === e4, s"is_ipv4('$v4')")
      assert(g6 === e6, s"is_ipv6('$v6')")
    }
    // MySQL: NULL input → 0 (these functions never return NULL)
    val nulls = Seq((null: String, null: String)).toDF("v4", "v6")
      .select(is_ipv4($"v4").cast("int"), is_ipv6($"v6").cast("int"))
      .collect().head
    assert(nulls.getInt(0) === 0 && nulls.getInt(1) === 0)
  }

  test("bitwise_operator.test: ~ & | ^ as truthy filter predicates on a=65535") {
    val t = Seq(65535L).toDF("a")
    // MySQL evaluates the 64-bit complement; truthiness = nonzero.
    // Signed vs unsigned display differs but the filter semantics agree.
    assert(t.filter(bitwise_not($"a") =!= 0L).collect().map(_.getLong(0)).toSeq
      === Seq(65535L), "where ~a")
    assert(t.filter((bitwise_not($"a").bitwiseAND(lit(65536L))) =!= 0L)
      .collect().map(_.getLong(0)).toSeq === Seq(65535L), "where ~a & 65536")
    assert(t.filter((bitwise_not($"a").bitwiseOR(lit(65535L))) =!= 0L)
      .collect().map(_.getLong(0)).toSeq === Seq(65535L), "where ~a | 65535")
    assert(t.filter(($"a".bitwiseXOR(lit(65534L))) === 1L)
      .collect().map(_.getLong(0)).toSeq === Seq(65535L), "where a ^ 65534 = 1")
  }

  test("datetime_literal.test + timestamp_literal.test: literals and tz display") {
    val t = Seq((1, "2020-01-01"), (1, "2020-01-02")).toDF("a", "bs")
      .select($"a", $"bs".cast("date").as("b"))
    val got = t.filter($"b" > lit(java.sql.Date.valueOf("2020-01-01")))
      .collect().map(r => (r.getInt(0), r.getDate(1).toString))
    assert(got.toSeq === Seq((1, "2020-01-02")))
    // timestamp '2020-01-01 00:00:00' stored under UTC, displayed in
    // +09:00 and Asia/Shanghai — the max() subquery matches the row
    val ts = Seq((1, "2020-01-01 00:00:00")).toDF("id", "s")
      .select($"id", to_timestamp($"s").as("value"))
    val mx = ts.agg(max($"value")).first().getTimestamp(0)
    val disp = ts.filter($"value" === mx)
      .select(date_format(from_utc_timestamp($"value", "+09:00"),
          "yyyy-MM-dd HH:mm:ss"),
        date_format(from_utc_timestamp($"value", "Asia/Shanghai"),
          "yyyy-MM-dd HH:mm:ss"))
      .collect().head
    assert(disp.getString(0) === "2020-01-01 09:00:00")
    assert(disp.getString(1) === "2020-01-01 08:00:00")
  }

  test("enum.test: right join on != against a single self row null-extends") {
    val t = Seq((1, "a")).toDF("a", "b")
    val got = t.as("t1").join(t.as("t2"), $"t1.a" =!= $"t2.a", "right")
      .select($"t1.a", $"t1.b", $"t2.a", $"t2.b")
      .collect().map(_.toSeq)
    assert(got.toSeq === Seq(Seq(null, null, 1, "a")))
  }
}
