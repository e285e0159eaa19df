package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Fourth tranche of reference fullstack transcripts
  * (`/root/reference/tests/fullstack-test/expr/<name>.test`) mirrored
  * verbatim: byte-level unhex, the calendar tail (last_day /
  * weekofyear / dayofweek / dayofyear over lax string coercion),
  * character-wise reverse on multibyte text, replace, and MySQL
  * substring position semantics. */
class FullstackParitySpec4 extends SparkTestBase {
  import spark.implicits._

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  private def ints(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) null else r.get(i)).toSeq).toSeq

  test("unhex.test: string and numeric args, invalid hex -> NULL, multibyte round-trip") {
    // expr/unhex.test t rows verbatim: (a char(100), b int)
    val t = Seq(
      ("7777772E70696E676361702E636F6D", 3039),
      ("61626364", 61626364),
      ("GG", -1),
      ("E38195E38289E381ABE585A5", 313233),
      ("F09F8DBB", 414243)).toDF("a", "b")
    assert(strs(t.select(mysql_unhex($"a"))) ===
      Seq("www.pingcap.com", "abcd", null, "さらに入", "🍻"))
    assert(strs(t.select(mysql_unhex($"b"))) ===
      Seq("09", "abcd", null, "123", "ABC"))
  }

  test("last_day.test: varchar lax coercion, datetime, date, leap years, zero day") {
    // expr/last_day.test t1 rows verbatim: ('' / '200' / zero-day
    // strings are NULL under strict NO_ZERO_IN_DATE, 2000 is leap,
    // 2001 is not
    val t1 = Seq(
      ("", "1999-10-10 10:10:10.123", "1999-01-10"),
      ("200", "1999-02-10 10:10:10.123", "1999-11-10"),
      ("1999-01-10", "1999-10-10 10:10:10.123", "1999-01-10"),
      ("2000-2-10", "2000-2-10 10:10:10", "2000-2-10"),
      ("2001-2-10", "2001-2-10 10:10:10", "2001-2-10"),
      ("2000-2-0", "2000-2-10 10:10:10", "2000-2-10"))
      .toDF("c1s", "c2s", "c3s")
      .withColumn("c2", try_to_timestamp($"c2s", lit("y-M-d H:m:s[.SSS]")))
      .withColumn("c3", mysql_lax_date($"c3s"))

    assert(strs(t1.orderBy($"c1s")
      .select(last_day(mysql_lax_date($"c1s")).cast("string"))) ===
      Seq(null, "1999-01-31", null, null, "2000-02-29", "2001-02-28"))
    assert(strs(t1.orderBy($"c2")
      .select(last_day($"c2").cast("string"))) ===
      Seq("1999-02-28", "1999-10-31", "1999-10-31",
        "2000-02-29", "2000-02-29", "2001-02-28"))
    assert(strs(t1.orderBy($"c3", $"c1s")
      .select(last_day($"c3").cast("string"))) ===
      Seq("1999-01-31", "1999-01-31", "1999-11-30",
        "2000-02-29", "2000-02-29", "2001-02-28"))

    // second table: every month of leap 2000 and non-leap 2001
    val months = (1 to 12).flatMap(m => Seq(s"2000-$m-01", s"2001-$m-01"))
      .toDF("c1").withColumn("d", mysql_lax_date($"c1"))
    val got = months.orderBy($"d")
      .select(last_day($"d").cast("string")).as[String].collect()
    val expect2000 = Seq("2000-01-31", "2000-02-29", "2000-03-31",
      "2000-04-30", "2000-05-31", "2000-06-30", "2000-07-31",
      "2000-08-31", "2000-09-30", "2000-10-31", "2000-11-30", "2000-12-31")
    val expect2001 = Seq("2001-01-31", "2001-02-28", "2001-03-31",
      "2001-04-30", "2001-05-31", "2001-06-30", "2001-07-31",
      "2001-08-31", "2001-09-30", "2001-10-31", "2001-11-30", "2001-12-31")
    assert(got.toSeq === expect2000 ++ expect2001)

    // third table: zero DAY ('2001-01-00') is NULL for every month
    // under strict mode
    val zeroDays = (1 to 12).flatMap(m =>
      Seq(f"2000-$m%02d-00", f"2001-$m%02d-00")).toDF("c1")
    assert(strs(zeroDays.select(last_day(mysql_lax_date($"c1")).cast("string")))
      .forall(_ == null))
  }

  test("week_of_year.test + day_of_weekyear.test: lax strings, datetime, date") {
    // shared t rows verbatim: (a char(20), b datetime, c date)
    val t = Seq(
      ("", "1970-1-1 12:12:12", "1970-1-1"),
      ("123", "1989-6-6 12:12:12", "1989-6-6"),
      ("2022-3-10", "2000-3-4 12:12:12", "2000-3-4"))
      .toDF("a", "bs", "cs")
      .withColumn("b", try_to_timestamp($"bs", lit("y-M-d H:m:s")))
      .withColumn("c", mysql_lax_date($"cs"))

    // MySQL WEEKOFYEAR = WEEK(d, 3) = ISO 8601 week — Spark's weekofyear
    assert(ints(t.select(weekofyear(mysql_lax_date($"a")),
      weekofyear($"b"), weekofyear($"c"))) ===
      Seq(Seq(null, 1, 1), Seq(null, 23, 23), Seq(10, 9, 9)))
    // MySQL DAYOFWEEK: 1 = Sunday — same convention as Spark
    assert(ints(t.select(dayofweek(mysql_lax_date($"a")),
      dayofweek($"b"), dayofweek($"c"))) ===
      Seq(Seq(null, 5, 5), Seq(null, 3, 3), Seq(5, 7, 7)))
    assert(ints(t.select(dayofyear(mysql_lax_date($"a")),
      dayofyear($"b"), dayofyear($"c"))) ===
      Seq(Seq(null, 1, 1), Seq(null, 157, 157), Seq(69, 64, 64)))
  }

  test("reverse.test: character-wise (not byte-wise) reversal of multibyte text") {
    // expr/reverse.test t rows verbatim (after MySQL literal
    // unescaping: \$ -> $, \` -> `, \\ -> \)
    val rows = Seq(
      "one week’s time test" -> "tset emit s’keew eno",
      "abc测试def" -> "fed试测cba",
      "abcテストabc" -> "cbaトステcba",
      "ѐёђѓєѕіїјљњћќѝўџ" -> "џўѝќћњљјїіѕєѓђёѐ",
      "+ѐ-ё*ђ/ѓ!є@ѕ#і$@ї%ј……љ&њ（ћ）ќ￥ѝ#ў@џ！^" ->
        "^！џ@ў#ѝ￥ќ）ћ（њ&љ……ј%ї@$і#ѕ@є!ѓ/ђ*ё-ѐ+",
      "αβγδεζηθικλμνξοπρστυφχψωσ" -> "σωψχφυτσρποξνμλκιθηζεδγβα",
      "▲α▼βγ➨δε☎ζη✂θι€κλ♫μν✓ξο✚πρ℉στ♥υφ♖χψ♘ω★σ✕" ->
        "✕σ★ω♘ψχ♖φυ♥τσ℉ρπ✚οξ✓νμ♫λκ€ιθ✂ηζ☎εδ➨γβ▼α▲",
      "թփձջրչճժծքոեռտըւիօպասդֆգհյկլխզղցվբնմշ" ->
        "շմնբվցղզխլկյհգֆդսապօիւըտռեոքծժճչրջձփթ",
      "$$$$$$" -> "$$$$$$",
      "`$$$$$" -> "$$$$$`",
      "\\$```" -> "```$\\")
    val t = rows.map(_._1).toDF("a")
    assert(strs(t.select(reverse($"a"))) === rows.map(_._2))
    assert(strs(Seq(Option.empty[String]).toDF("a").select(reverse($"a")))
      === Seq(null))
  }

  test("replace.test: column and literal search/replacement operands") {
    // expr/replace.test t row verbatim
    val t = Seq(("hello world", "hello", "???")).toDF("c1", "c2", "c3")
    assert(strs(t.select(call_function("replace", $"c1", $"c2", $"c3")))
      === Seq("??? world"))
    assert(strs(t.select(call_function("replace", lit("hello world"), $"c2", $"c3")))
      === Seq("??? world"))
    assert(strs(t.select(call_function("replace", lit("hello world"),
      lit("hello"), lit("???")))) === Seq("??? world"))
    assert(strs(t.select(call_function("replace", lit("hello world"), $"c2",
      lit("???")))) === Seq("??? world"))
    assert(strs(t.select(call_function("replace", lit("hello world"),
      lit("hello"), $"c3"))) === Seq("??? world"))
  }

  test("substring_utf8.test: negative / zero / out-of-range positions") {
    // expr/substring_utf8.test t rows verbatim: (a char(10), b int,
    // c tinyint unsigned)
    val t = Seq(("", -3, 2), ("abc", -3, 2)).toDF("a", "b", "c")
    assert(t.where(mysql_substring($"a", lit(-3), lit(4)) === "abc")
      .select($"a").as[String].collect().toSeq === Seq("abc"))
    assert(t.where(mysql_substring($"a", lit(-3), lit(2)) === "ab")
      .select($"a").as[String].collect().toSeq === Seq("abc"))
    assert(t.where(mysql_substring($"a", $"b", $"c") === "ab")
      .select($"a").as[String].collect().toSeq === Seq("abc"))
    // |pos| > length -> '' in MySQL (Spark's builtin would clamp to
    // the string start and return 'abc')
    assert(t.where(mysql_substring($"a", lit(-4), lit(3)) === "abc").count() === 0)
    assert(t.where(mysql_substring($"a", lit(0), lit(3)) === "").count() === 2)

    // t1 rows verbatim: substring('abc', c2) for c2 in (-4, 4) -> ''
    val t1 = Seq((-82, -4), (1, 4)).toDF("c1", "c2")
    assert(ints(t1.orderBy($"c2")
      .select($"c2", mysql_substring(lit("abc"), $"c2").as("b"))) ===
      Seq(Seq(-4, ""), Seq(4, "")))
  }

  test("cast_string_as_real.test: prefix parse, no-prefix -> 0, DBL_MAX clamp") {
    // expr/cast_string_as_real.test t rows verbatim (sorted by a, NULL
    // first, as the transcript orders them)
    val rows: Seq[(String, Option[Double])] = Seq(
      (null, None),
      "+123.123-" -> Some(123.123),
      "-0x01" -> Some(-0.0),
      "-123.99" -> Some(-123.99),
      "-1e649" -> Some(-1.7976931348623157e308),
      "-1x01.2" -> Some(-1.0),
      "0" -> Some(0.0),
      "0.0" -> Some(0.0),
      "0x01" -> Some(0.0),
      "0x01.2" -> Some(0.0),
      "1.11.00" -> Some(1.11),
      "1.23" -> Some(1.23),
      "11.xx" -> Some(11.0),
      "11xx" -> Some(11.0),
      "123" -> Some(123.0),
      "1e649" -> Some(1.7976931348623157e308),
      "1x01" -> Some(1.0),
      "9.999999999999999" -> Some(9.999999999999998),
      "9.9999999999999999" -> Some(10.0),
      "x1" -> Some(0.0),
      "xx.11" -> Some(0.0))
    val t = rows.map(r => Option(r._1)).toDF("a")
    val got = t.select($"a", mysql_cast_real($"a").as("b")).orderBy(asc_nulls_first("a"))
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(got.toSeq === rows.map(_._2))
    // '-0x01' keeps its NEGATIVE zero, as MySQL displays '-0'
    val negZero = t.where($"a" === "-0x01")
      .select(mysql_cast_real($"a")).head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(negZero) ===
      java.lang.Double.doubleToRawLongBits(-0.0))
  }

  test("cast_decimal_overflow.test: round then saturate at type bounds") {
    import org.apache.spark.sql.types.DecimalType
    def dec(df: org.apache.spark.sql.DataFrame): String =
      df.head().getDecimal(0).toPlainString

    // t1 decimal(6,4) row verbatim (decimal(60,3) capped to the
    // engine's documented 38-digit maximum)
    val d = Seq(BigDecimal("99.9999")).toDF("c1")
    assert(dec(d.select(mysql_cast_decimal($"c1", 38, 3))) === "100.000")
    assert(dec(d.select(mysql_cast_decimal($"c1", 5, 3))) === "99.999")
    assert(dec(d.select(mysql_cast_decimal($"c1", 7, 5))) === "99.99990")
    assert(dec(d.select(mysql_cast_decimal($"c1", 6, 5))) === "9.99999")

    // integer-width rows verbatim: every MySQL int flavor at its max,
    // saturating when the decimal is narrower
    val ints8 = Seq((127, 255)).toDF("tiny", "tinyu")
    assert(dec(ints8.select(mysql_cast_decimal($"tiny", 3, 0))) === "127")
    assert(dec(ints8.select(mysql_cast_decimal($"tiny", 3, 1))) === "99.9")
    assert(dec(ints8.select(mysql_cast_decimal($"tinyu", 3, 0))) === "255")
    assert(dec(ints8.select(mysql_cast_decimal($"tinyu", 3, 1))) === "99.9")
    val ints16 = Seq((32767, 65535, 8388607, 16777215)).toDF("s", "su", "m", "mu")
    assert(dec(ints16.select(mysql_cast_decimal($"s", 5, 0))) === "32767")
    assert(dec(ints16.select(mysql_cast_decimal($"s", 5, 1))) === "9999.9")
    assert(dec(ints16.select(mysql_cast_decimal($"su", 5, 0))) === "65535")
    assert(dec(ints16.select(mysql_cast_decimal($"su", 5, 1))) === "9999.9")
    assert(dec(ints16.select(mysql_cast_decimal($"m", 10, 0))) === "8388607")
    assert(dec(ints16.select(mysql_cast_decimal($"m", 10, 1))) === "8388607.0")
    assert(dec(ints16.select(mysql_cast_decimal($"mu", 10, 0))) === "16777215")
    assert(dec(ints16.select(mysql_cast_decimal($"mu", 10, 1))) === "16777215.0")
    val ints64 = Seq((Long.MaxValue,
      BigDecimal("18446744073709551615"))).toDF("b", "bu")
    assert(dec(ints64.select(mysql_cast_decimal($"b", 20, 0)))
      === "9223372036854775807")
    assert(dec(ints64.select(mysql_cast_decimal($"b", 20, 1)))
      === "9223372036854775807.0")
    assert(dec(ints64.select(mysql_cast_decimal($"bu", 20, 0)))
      === "18446744073709551615")
    assert(dec(ints64.select(mysql_cast_decimal($"bu", 20, 1)))
      === "9999999999999999999.9")

    // datetime(5) row verbatim: numeric form yyyymmddhhmmss.fff
    val ts = Seq("2022-10-10 10:10:10.12345").toDF("s")
      .select(try_to_timestamp($"s", lit("y-M-d H:m:s.SSSSS")).as("c1"))
    assert(dec(ts.select(mysql_cast_decimal(mysql_time_number($"c1"), 16, 3)))
      === "9999999999999.999")
    assert(dec(ts.select(mysql_cast_decimal(mysql_time_number($"c1"), 17, 3)))
      === "20221010101010.123")
    assert(dec(ts.select(mysql_cast_decimal(mysql_time_number($"c1"), 18, 3)))
      === "20221010101010.123")

    // date row verbatim: numeric form yyyymmdd
    val dt = Seq("2020-10-10").toDF("s").select(to_date($"s").as("c1"))
    assert(dec(dt.select(mysql_cast_decimal(mysql_date_number($"c1"), 7, 0)))
      === "9999999")
    assert(dec(dt.select(mysql_cast_decimal(mysql_date_number($"c1"), 8, 0)))
      === "20201010")
    assert(dec(dt.select(mysql_cast_decimal(mysql_date_number($"c1"), 9, 0)))
      === "20201010")
    assert(dec(dt.select(mysql_cast_decimal(mysql_date_number($"c1"), 9, 1)))
      === "20201010.0")
    assert(dec(dt.select(mysql_cast_decimal(mysql_date_number($"c1"), 9, 2)))
      === "9999999.99")
  }

  test("cast_time_as_int.test: datetime -> yyyymmddhhmmss, date -> yyyymmdd") {
    // expr/cast_time_as_int.test row verbatim
    val t = Seq(("2021/04/13 00:34:00.123456", "2021/04/13")).toDF("dts", "ds")
      .select(try_to_timestamp($"dts", lit("y/M/d H:m:s.SSSSSS")).as("col_datetime"),
        try_to_timestamp($"ds", lit("y/M/d")).cast("date").as("col_date"))
    assert(t.where(
      round(mysql_time_number($"col_datetime")).cast("long") === 20210413003400L &&
        mysql_date_number($"col_date").cast("long") === 20210413L).count() === 1)
  }

  test("concat_ws.test: column separator, NULL separator -> NULL, NULL args skipped") {
    // expr/concat_ws.test t rows verbatim (concat_ws(a, b, c, d) — the
    // SEPARATOR is the first column)
    val t = Seq(
      (Some("a"), Some("b"), Some("c"), Some("d")),
      (Some("中"), Some("文"), Some("测"), Some("试")),
      (Some("e"), Some("f"), None, Some("h")),
      (None, Some("j"), Some("k"), Some("l")))
      .toDF("a", "b", "c", "d")
    val grouped = t.groupBy(call_function("concat_ws", $"a", $"b", $"c", $"d").as("cw"))
      .count().collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    assert(grouped === Map("feh" -> 1L, (null: String) -> 1L,
      "文中测中试" -> 1L, "bacad" -> 1L))
  }
}
