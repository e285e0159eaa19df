package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Round-5 continuation of [[FullstackParitySpec]]: more reference
  * fullstack transcripts (`/root/reference/tests/fullstack-test/expr/
  * <name>.test`) mirrored verbatim — literal input rows, literal
  * expected outputs. Spark built-ins are used where their semantics
  * already match MySQL (substring_index); `MySqlCompat` wrappers close
  * the gaps (strcmp, guarded pads, day numbers, unsigned-64 shifts,
  * IS TRUE/FALSE). */
class FullstackParitySpec2 extends SparkTestBase {
  import spark.implicits._

  test("strcmp.test: -1/0/1 with NULL propagation, both argument orders") {
    // expr/strcmp.test cmp table rows + expected outputs verbatim
    val cmp = Seq(
      (Some("aaaa"), Some("bbbb")), (Some("aaaa"), Some("%a%")),
      (Some("a"), Some("a")), (Some("a"), Some("b")), (Some("b"), Some("a")),
      (Some(""), Some("")), (Some(""), None), (None, Some("")), (None, None))
      .toDF("a", "b")
    val got = cmp.select(mysql_strcmp($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq === Seq(-1, 1, 0, -1, 1, 0, null, null, null))

    val t = Seq(Some("a"), Some("b"), Some("c"), None).toDF("a")
    assert(t.select(mysql_strcmp(lit("b"), $"a")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
      === Seq(1, 0, -1, null))
    assert(t.select(mysql_strcmp($"a", lit("b"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
      === Seq(-1, 0, 1, null))
    assert(t.select(mysql_strcmp($"a", lit(null).cast("string"))).collect()
      .forall(_.isNullAt(0)))
  }

  test("pad.test: truncation, empty-pad NULL, negative-length NULL, UTF-8 chars") {
    // expr/pad.test t rows: (len, str, pad) with expected lpad/rpad
    val t = Seq((Some(1), "abc", "def"), (Some(1), "abc", ""),
      (Some(100), "abc", ""), (Some(-1), "abc", ""), (None, "abc", "def"))
      .toDF("c1", "c2", "c3")
    def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(strs(t.select(mysql_lpad($"c2", $"c1", $"c3")))
      === Seq("a", "a", null, null, null))
    assert(strs(t.select(mysql_rpad($"c2", $"c1", $"c3")))
      === Seq("a", "a", null, null, null))

    // t1 rows: multibyte strings — counts are characters, not bytes
    val t1 = Seq((1, "杭州", ""), (5, "杭州", ""), (5, "杭州", "西湖"),
      (5, "杭州", "test"), (5, "", "西湖")).toDF("c1", "c2", "c3")
    assert(strs(t1.select(mysql_lpad($"c2", $"c1", $"c3")))
      === Seq("杭", null, "西湖西杭州", "tes杭州", "西湖西湖西"))
    assert(strs(t1.select(mysql_rpad($"c2", $"c1", $"c3")))
      === Seq("杭", null, "杭州西湖西", "杭州tes", "西湖西湖西"))
    assert(strs(t1.select(mysql_rpad($"c1", $"c1", $"c3")))
      === Seq("1", null, "5西湖西湖", "5test", "5西湖西湖"))
    assert(strs(t1.select(mysql_rpad($"c1", $"c1", $"c1")))
      === Seq("1", "55555", "55555", "55555", "55555"))
    // rpad(c2,c2,c2): MySQL lax-casts '杭州'/'' to length 0 → '' for
    // every row (the transcript's single '' group of count 5)
    val g = t1.select(mysql_rpad($"c2",
        coalesce(mysql_cast_signed($"c2"), lit(0)), $"c2").as("p"))
      .groupBy($"p").count().collect()
    assert(g.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("", 5L)))
    // lpad('y', 0, c1) → '' ; lpad/rpad('a', -1, 'b') → NULL
    assert(strs(Seq("b").toDF("c1").select(mysql_lpad(lit("y"), lit(0), $"c1")))
      === Seq(""))
    assert(strs(Seq(("a", -1)).toDF("c1", "c2")
      .select(mysql_lpad($"c1", $"c2", lit("b")))) === Seq(null))
    assert(strs(Seq(("a", -1)).toDF("c1", "c2")
      .select(mysql_rpad($"c1", $"c2", lit("b")))) === Seq(null))
  }

  test("substring_index.test: positive/negative counts, multi-char + UTF-8 delims") {
    // expr/substring_index.test table 1: non-string args stringify
    val t0 = Seq(("www.pingcap.com", 12345, 123.45)).toDF("a", "b", "c")
    val r0 = t0.select(
      substring_index($"a", ".", 2),
      substring_index($"b".cast("string"), ".", 2),
      substring_index($"c".cast("string"), ".", -1)).collect()(0)
    assert((r0.getString(0), r0.getString(1), r0.getString(2))
      === (("www.pingcap", "12345", "45")))

    // table 2 rows + the 18 expected outputs verbatim (incl. the ''
    // row where the string begins with the delimiter, and NULL rows)
    val rows = Seq(
      (Some("www.pingcap.com"), Some("."), Some(1)),
      (Some("www.pingcap.com"), Some("."), Some(2)),
      (Some("www.pingcap.com"), Some("."), Some(-2)),
      (Some("www.pingcap.com"), Some("."), Some(100)),
      (Some("www.pingcap.com"), Some("."), Some(-100)),
      (Some("www......pingcap....com"), Some(".."), Some(1)),
      (Some("www......pingcap....com"), Some(".."), Some(2)),
      (Some("www......pingcap....com"), Some(".."), Some(-2)),
      (Some("www......pingcap....com"), Some(".."), Some(3)),
      (Some("www......pingcap....com"), Some(".."), Some(-4)),
      (Some("测试测试测试测试abcd测试"), Some("测"), Some(1)),
      (Some("测试测试测试测试abcd测试"), Some("试"), Some(2)),
      (Some("测试测试abcd测试测试abcd测试"), Some("试a"), Some(-1)),
      (Some("测试测试abcd测试测试abcd测试"), Some("bc"), Some(1)),
      (Some("测试测试测试测试abcd测试"), Some("试测"), Some(1)),
      (None, Some("测"), Some(1)),
      (Some("测试"), None, Some(2)),
      (Some("测试"), Some("试"), None)).toDF("a", "b", "c")
    val got = rows.select(mysql_substring_index($"a", $"b", $"c")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq === Seq(
      "www", "www.pingcap", "pingcap.com", "www.pingcap.com",
      "www.pingcap.com", "www", "www..", "..com", "www....",
      "..pingcap....com", "", "测试测", "bcd测试", "测试测试a", "测",
      null, null, null))
    // documents the divergence the wrapper closes: Spark's built-in
    // scans overlapping matches of a multi-char delimiter
    val builtin = Seq(("www......pingcap....com", "..", 2)).toDF("a", "b", "c")
      .select(expr("substring_index(a, b, c)")).collect()(0).getString(0)
    assert(builtin === "www.")
  }

  test("from_days.test: zero-date below 366, 9999-12-31 clamp, to_days round trip") {
    // expr/from_days.test MPP-mode expected column verbatim
    val t = Seq[Option[Int]](None, Some(-100), Some(0), Some(1), Some(365),
      Some(366), Some(367), Some(730850), Some(3652424), Some(3652425),
      Some(3652499), Some(3652500), Some(3652501)).toDF("a")
    val got = t.select($"a", mysql_from_days_str($"a").as("fd"),
        mysql_to_days(try_to_date(mysql_from_days_str($"a"))).as("td"))
      .collect()
      .map(r => (if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
    assert(got.toSeq === Seq(
      (null, null), ("0000-00-00", null), ("0000-00-00", null),
      ("0000-00-00", null), ("0000-00-00", null),
      ("0001-01-01", 366L), ("0001-01-02", 367L),
      ("2000-12-31", 730850L), ("9999-12-31", 3652424L),
      (null, null), (null, null), (null, null), (null, null)))
  }

  test("to_seconds.test: seconds-since-year-0 for datetimes and dates") {
    // expr/to_seconds.test expected values verbatim
    val dts = Seq(
      ("1999-02-10 10:10:10", 63085860610L),
      ("1999-10-10 10:10:10", 63106769410L),
      ("2000-02-10 10:10:10", 63117396610L),
      ("2001-02-10 10:10:10", 63149019010L))
    val gotDt = dts.map(_._1).toDF("c2")
      .select(mysql_to_seconds(to_timestamp($"c2"))).collect().map(_.getLong(0))
    assert(gotDt.toSeq === dts.map(_._2))
    val ds = Seq(
      ("1999-01-10", 63083145600L), ("1999-11-10", 63109411200L),
      ("2000-02-10", 63117360000L), ("2001-02-10", 63148982400L))
    val gotD = ds.map(d => Date.valueOf(d._1)).toDF("c3")
      .select(mysql_to_seconds($"c3")).collect().map(_.getLong(0))
    assert(gotD.toSeq === ds.map(_._2))
  }

  test("bitshift_operator.test: unsigned-64 display, >=64 clamps to 0") {
    // expr/bitshift_operator.test expected outputs verbatim
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val t1 = Seq(-1).toDF("a")
    val r1 = t1.select(s(mysql_shr($"a", lit(0))), s(mysql_shr($"a", lit(64))),
      s(mysql_shr($"a", lit(10)))).collect()(0)
    assert((r1.getString(0), r1.getString(1), r1.getString(2)) ===
      (("18446744073709551615", "0", "18014398509481983")))
    assert(t1.filter(mysql_shr($"a", lit(100000)) === 0).count() === 1L)
    assert(t1.filter(mysql_shr($"a", lit(63)) === 1).count() === 1L)

    val t2 = Seq(Some(-1), Some(1), None).toDF("a")
    val r2 = t2.select(s(mysql_shl($"a", lit(0))), s(mysql_shl($"a", lit(64))),
      s(mysql_shl($"a", lit(10)))).collect()
    def v(r: org.apache.spark.sql.Row, i: Int) =
      if (r.isNullAt(i)) null else r.getString(i)
    assert(r2.map(r => (v(r, 0), v(r, 1), v(r, 2))).toSeq === Seq(
      ("18446744073709551615", "0", "18446744073709550592"),
      ("1", "0", "1024"), (null, null, null)))
    assert(t2.filter(mysql_shl($"a", lit(100000)) === 0).count() === 2L)
    assert(t2.filter(mysql_shl($"a", lit(6)) === 64).count() === 1L)
  }

  test("having.test: value <> ANY(subquery) as the decorrelated min/max rewrite") {
    // mpp/having.test: t1 rows vs t2 = {ddd, eee, ccc} — every t1
    // value differs from at least one t2 value, so all 3 rows survive
    import graft.operators.Coverage.{neAny, gtAll, ltAny}
    val t1 = Seq((0, "aaa"), (1, "bbb"), (2, "ccc")).toDF("id", "value")
    val t2 = Seq("ddd", "eee", "ccc").toDF("v")
    val st = broadcast(t2.agg(count(lit(1)).as("cnt"), count($"v").as("cnt_nn"),
      min($"v").as("mn"), max($"v").as("mx")))
    val got = t1.crossJoin(st)
      .filter(neAny($"value", $"cnt", $"cnt_nn", $"mn", $"mx"))
      .select($"id", $"value").orderBy($"id").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq === Seq((0, "aaa"), (1, "bbb"), (2, "ccc")))

    // three-valued truth table (matches the DuckDB ANY/ALL probes):
    // S = {1, 2, NULL}, S_empty = {}, S_null = {NULL}, S_eq = {5, 5}
    def stats(vals: Seq[Option[Int]]) = broadcast(vals.toDF("v")
      .agg(count(lit(1)).as("cnt"), count($"v").as("cnt_nn"),
        min($"v").as("mn"), max($"v").as("mx")))
    def tri(c: org.apache.spark.sql.Column, x: Option[Int],
        vals: Seq[Option[Int]]): Any = {
      val r = Seq(x).toDF("x").crossJoin(stats(vals)).select(c).collect()(0)
      if (r.isNullAt(0)) null else r.getBoolean(0)
    }
    val s3 = Seq(Some(1), Some(2), None)
    def GT(x: Option[Int], v: Seq[Option[Int]]) =
      tri(gtAll($"x", $"cnt", $"cnt_nn", $"mx"), x, v)
    def NE(x: Option[Int], v: Seq[Option[Int]]) =
      tri(neAny($"x", $"cnt", $"cnt_nn", $"mn", $"mx"), x, v)
    def LT(x: Option[Int], v: Seq[Option[Int]]) =
      tri(ltAny($"x", $"cnt", $"cnt_nn", $"mx"), x, v)
    assert(GT(Some(3), s3) === null)
    assert(GT(Some(1), s3) === false)
    assert(GT(Some(0), s3) === false)
    assert(GT(Some(3), Nil) === true)
    assert(NE(Some(3), Nil) === false)
    assert(LT(Some(3), Nil) === false)
    assert(GT(Some(3), Seq(None)) === null)
    assert(NE(Some(3), Seq(None)) === null)
    assert(NE(Some(5), Seq(Some(5), Some(5))) === false)
    assert(NE(Some(4), Seq(Some(5), Some(5))) === true)
    assert(NE(Some(5), s3) === true)
    assert(NE(Some(1), s3) === true)
    assert(LT(Some(3), s3) === null)
    assert(LT(Some(0), s3) === true)
    assert(LT(Some(2), s3) === null)
    assert(GT(None, s3) === null)
    assert(GT(None, Nil) === true)
  }

  test("str_to_date.test: whitespace-lax parsing, fractions, zero-date components") {
    def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    // suite 2: '%d/%b/%Y  %H:%i:%S.%f' — stray spaces inside the time,
    // bare trailing dot, partial fraction digits (microsecond-padded)
    val s2 = Seq("31/May /2016 12: 34:56.1234", "30/Apr/2016 12:34:56.",
      "30/Apr/2016 12:34:56.9").toDF("a")
    assert(strs(s2.select(date_format(
      mysql_str_to_datetime_lax($"a", "%d/%b/%Y  %H:%i:%S.%f"),
      "yyyy-MM-dd HH:mm:ss.SSSSSS"))).sorted === Seq(
      "2016-04-30 12:34:56.000000", "2016-04-30 12:34:56.900000",
      "2016-05-31 12:34:56.123400"))
    // suite 3: no %f in the format — the trailing '.' is unmatched
    // input MySQL ignores with a warning
    val s3 = Seq("31 /May/2016 12: 34:56.", "30/Apr/2016 12:34:56").toDF("a")
    assert(strs(s3.select(date_format(
      mysql_str_to_datetime_lax($"a", " %d/%b/%Y  %H:%i:%S"),
      "yyyy-MM-dd HH:mm:ss"))).sorted === Seq(
      "2016-04-30 12:34:56", "2016-05-31 12:34:56"))
    // suite 4: single-digit day, spaces around separators, trailing
    // format/input whitespace
    val s4 = Seq("31/May/2016", "30/ Apr/ 2016 ", " 1/Apr/2016 ").toDF("a")
    assert(strs(s4.select(date_format(
      mysql_str_to_date_lax($"a", "%d/%b/%Y "), "yyyy-MM-dd"))).sorted
      === Seq("2016-04-01", "2016-04-30", "2016-05-31"))
    // suite 1: zero month/day components survive as the q100-style
    // string sentinel ('0/0/2012' → '2012-00-00'); unparseable input
    // falls back to the all-zeros date, as the transcript's IFNULL does
    val s1 = Seq("00/00/0000", "13/05/2019", "0/0/2012", "abc").toDF("a")
    val n = mysql_datetime_normalize($"a")
    val parts = split(n, "/")
    val zeroDate = when(n.rlike("^\\d{2}/\\d{2}/\\d{4}$"),
      concat_ws("-", element_at(parts, 3), element_at(parts, 2),
        element_at(parts, 1))).otherwise(lit("0000-00-00"))
    assert(strs(s1.select(zeroDate)).sorted === Seq(
      "0000-00-00", "0000-00-00", "2012-00-00", "2019-05-13"))
  }

  test("format.test: thousands separators, per-row d, float-vs-double rounding") {
    // expr/format.test first table: the float row rounds to 12.123 at
    // d=3 (binary float is 12.12349987…) while the DOUBLE and DECIMAL
    // rows round to 12.124 (shortest rendering 12.1235, half up) —
    // the transcript's float/double split reproduced exactly
    val t = Seq((12.1235f, 12.1235d, BigDecimal("12.1235"), 1234, 5),
      (12.1235f, 12.1235d, BigDecimal("12.1235"), 1234, 4),
      (12.1235f, 12.1235d, BigDecimal("12.1235"), 1234, 3))
      .toDF("a", "b", "c", "d", "e")
    def strs(c: org.apache.spark.sql.Column): Seq[String] =
      t.select(c).collect().map(_.getString(0)).toSeq
    assert(strs(mysql_format($"a", $"e")) === Seq("12.12350", "12.1235", "12.123"))
    assert(strs(mysql_format($"b", $"e")) === Seq("12.12350", "12.1235", "12.124"))
    assert(strs(mysql_format($"c", $"e")) === Seq("12.12350", "12.1235", "12.124"))
    assert(strs(mysql_format($"d", $"e"))
      === Seq("1,234.00000", "1,234.0000", "1,234.000"))
    // decimal(7,4) table: negative d clamps to 0; d past the stored
    // scale zero-pads
    val v = Seq(BigDecimal("999.9999")).toDF("value")
    def one(d: Int): String =
      v.select(mysql_format($"value", lit(d))).collect()(0).getString(0)
    assert(one(-2) === "1,000")
    assert(one(0) === "1,000")
    assert(one(2) === "1,000.00")
    assert(one(10) === "999.9999000000")
    assert(one(20) === "999.999900000000000000" + "00")
    assert(v.select(mysql_format($"value", lit(null))).collect()(0).isNullAt(0))
  }

  test("is_true_false.test: NULL is neither true nor false (0, not NULL)") {
    // expr/is_true_false.test t1 rows over int/float/double/decimal
    val t1 = Seq(
      (Some(1), Some(50f), Some(60d), Some(BigDecimal("100.0"))),
      (Some(0), Some(0f), Some(0d), Some(BigDecimal("0.0"))),
      (None, None, None, None)).toDF("id", "id5", "id6", "id10")
    def ints(c: org.apache.spark.sql.Column): Seq[Int] =
      t1.select(c).collect().map(_.getInt(0)).toSeq
    for (col <- Seq($"id", $"id5", $"id6", $"id10")) {
      assert(ints(mysql_istrue(col)) === Seq(1, 0, 0))
      assert(ints(mysql_isfalse(col)) === Seq(0, 1, 0))
    }
  }
}
