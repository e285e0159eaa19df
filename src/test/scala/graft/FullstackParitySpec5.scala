package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Fifth tranche of reference fullstack transcripts
  * (`/root/reference/tests/fullstack-test/expr/<name>.test`) mirrored
  * verbatim: dayname/monthname over zero-component and compact date
  * literals, ADDDATE with real day counts, datediff sign/grouping, and
  * the YEAR-vs-DATE comparison rule. */
class FullstackParitySpec5 extends SparkTestBase {
  import spark.implicits._

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("datename_monthname.test: dayname needs a full date, monthname only a month") {
    // expr/datename_monthname.test t1 rows verbatim ('0000-12-01' is a
    // VALID proleptic date -> Friday; any zero month/day -> NULL)
    val t1 = Seq("0000-00-00", "0000-01-00", "2022-00-01", "0000-12-01",
      "20220221", "20220222", "20220223", "20220224", "20220225",
      "20220226", "20220227").toDF("col_string")
    assert(strs(t1.select(mysql_dayname($"col_string"))) === Seq(
      null, null, null, "Friday", "Monday", "Tuesday", "Wednesday",
      "Thursday", "Friday", "Saturday", "Sunday"))
    assert(strs(t1.select(mysql_dayname(lit("2022-02-21")))).forall(_ == "Monday"))
    assert(strs(t1.select(mysql_dayname(lit("0000-01-00")))).forall(_ == null))
    assert(strs(t1.select(mysql_dayname(lit("")))).forall(_ == null))

    // t2 rows verbatim: '0000-01-00' still names January (zero DAY ok)
    val t2 = Seq("0000-00-00", "0000-00-01", "0000-01-00", "2022-01-01",
      "20220221", "20220321", "20220421", "20220521", "20220621",
      "20220721", "20220821", "20220921", "20221021", "20221121",
      "20221221").toDF("col_string")
    assert(strs(t2.select(mysql_monthname($"col_string"))) === Seq(
      null, null, "January", "January", "February", "March", "April",
      "May", "June", "July", "August", "September", "October",
      "November", "December"))
    assert(strs(t2.select(mysql_monthname(lit("20220221")))).forall(_ == "February"))
    assert(strs(t2.select(mysql_monthname(lit("0000-00-01")))).forall(_ == null))
    assert(strs(t2.select(mysql_monthname(lit("")))).forall(_ == null))
  }

  test("adddate_string_real.test: real day counts round half away from zero") {
    // expr/adddate_string_real.test rows verbatim; col_date holds the
    // MySQL-computed expectation for = / < / > filters per unit
    val t = Seq(
      ("2006-10-11", "2006-10-10", 1.2, "DAY"),
      ("2019-03-27", "2019-03-26", 1.6, "DAY"),
      ("2006-10-09", "2006-10-10", -1.2, "DAY"),
      ("2019-03-25", "2019-03-26", -1.6, "DAY"),
      ("2000-03-01", "2000-02-28", 1.2, "DAYLEAP"),
      ("2000-03-01", "2000-02-28", 1.6, "DAYLEAP"),
      ("2000-03-01", "2000-03-02", -1.2, "DAYLEAP"),
      ("2000-03-01", "2000-03-02", -1.6, "DAYLEAP"))
      .toDF("col_date_s", "col_string", "col_real", "unit")
      .withColumn("col_date", to_date($"col_date_s"))
      .withColumn("added", mysql_adddate_real($"col_string", $"col_real"))

    def rows(cond: org.apache.spark.sql.Column, unit: String): Seq[(String, Double)] =
      t.where(cond && $"unit" === unit)
        .select($"col_string", $"col_real").orderBy($"col_string", $"col_real")
        .as[(String, Double)].collect().toSeq

    // DAYLEAP: 2000-02-28 + 1.2d = 02-29 < 03-01; +1.6d = 03-01;
    // 03-02 - 1.2d = 03-01; -1.6d = 02-29
    assert(rows($"col_date" > $"added", "DAYLEAP") ===
      Seq(("2000-02-28", 1.2), ("2000-03-02", -1.6)))
    assert(rows($"col_date" === $"added", "DAYLEAP") ===
      Seq(("2000-02-28", 1.6), ("2000-03-02", -1.2)))
    assert(rows($"col_date" < $"added", "DAY") === Seq(("2019-03-26", 1.6)))
    assert(rows($"col_date" === $"added", "DAY") ===
      Seq(("2006-10-10", -1.2), ("2006-10-10", 1.2)))
    assert(rows($"col_date" > $"added", "DAY") === Seq(("2019-03-26", -1.6)))
  }

  test("date_diff.test: datetime time-of-day is ignored, sign follows a-b") {
    // expr/date_diff.test rows verbatim ((datetime, date) pairs; MySQL
    // coerces the time-of-day away on both sides)
    val t = Seq(
      (Some("2021-02-28 23:59:59"), Some("2021-03-01")),
      (Some("2021-03-01 00:00:00"), Some("2021-02-28")),
      (Some("2021-03-01 00:00:00"), Some("2021-03-01")),
      (Some("2021-03-01 00:00:00"), Some("2020-02-28")),
      (Some("2020-03-01 00:00:00"), Some("2020-02-28")),
      (Some("2020-02-28 23:59:59"), Some("2020-03-01")),
      (Some("2020-03-01 00:00:00"), Some("2020-02-28")),
      (Some("2021-03-01 00:00:00"), Some("2021-03-01")),
      (Some("2020-02-28 00:00:00"), Some("2021-03-01")),
      (Some("2020-02-28 00:00:00"), Some("2020-03-01")),
      (None, Some("2020-03-01")),
      (Some("2020-02-28 00:00:00"), None))
      .toDF("as", "bs")
      .select(try_to_timestamp($"as").as("a"), to_date($"bs").as("b"))
    val grouped = t.groupBy(datediff($"a".cast("date"), $"b").as("dd"))
      .count().collect()
      .map(r => (if (r.isNullAt(0)) null else r.getInt(0)) -> r.getLong(1)).toMap
    assert(grouped === Map[Any, Long](0 -> 2L, 367 -> 1L, (-1) -> 1L,
      (-367) -> 1L, 1 -> 1L, (-2) -> 2L, 2 -> 2L, (null: Any) -> 2L))
  }

  test("compare_year_with_date.test: YEAR column compares against YEAR(date)") {
    // expr/compare_year_with_date.test rows verbatim: 2005 > '2004-10-10'
    // is TRUE (year vs year), 2015 > '2018-03-27' is FALSE
    val t = Seq((2005, "2004-10-10"), (2015, "2018-03-27")).toDF("a", "bs")
      .withColumn("b", to_date($"bs"))
    val got = t.where($"a" > year($"b")).select($"a", $"bs")
      .as[(Int, String)].collect().toSeq
    assert(got === Seq((2005, "2004-10-10")))
  }

  test("math_func.test: sign/ln/log2/log10/log(b,x)/exp/pow/deg/rad/crc32/conv") {
    // expr/math_func.test t row verbatim
    val t = Seq((2, -1.1, math.exp(1), 0.25, 100.0, 1.0,
      180 / math.Pi, math.Pi, "hello", "af"))
      .toDF("i", "test_sign", "test_ln", "test_log2", "test_log10",
        "test_exp", "test_radians", "test_degrees", "test_crc32", "test_conv")
    def one(c: org.apache.spark.sql.Column): Double =
      t.agg(c.cast("double")).head().getDouble(0)
    assert(one(sum(signum($"test_sign"))) === -1.0)
    assert(one(round(sum(log($"test_ln")))) === 1.0)
    assert(one(sum(log2($"test_log2"))) === -2.0)
    assert(one(sum(log10($"test_log10"))) === 2.0)
    // MySQL log(b, x) is log base b of x
    assert(one(sum(expr("log(i, test_log2)"))) === -2.0)
    assert(one(round(sum(exp($"test_exp")), 3)) === 2.718)
    assert(one(sum(pow($"i", $"i"))) === 4.0)
    assert(one(round(sum(degrees($"test_degrees")))) === 180.0)
    assert(one(round(sum(radians($"test_radians")))) === 1.0)
    assert(one(sum(crc32($"test_crc32"))) === 907060870.0)
    assert(one(sum(conv($"test_conv", 16, 10).cast("long"))) === 175.0)
  }

  test("sqrt.test: decimal/float/int sqrt sums, sqrt(negative) -> NULL") {
    import org.apache.spark.sql.types.DecimalType
    // expr/sqrt.test row verbatim (decimal(50,25) capped to the
    // engine's 38-digit maximum)
    val t = Seq((BigDecimal("1.21"), BigDecimal("1.44"), 0.25, 4))
      .toDF("ld", "bd", "f", "i")
      .select($"ld".cast(DecimalType(10, 2)).as("ld"),
        $"bd".cast(DecimalType(38, 25)).as("bd"), $"f", $"i")
    val r = t.agg(
      sum(mysql_sqrt($"ld")), sum(mysql_sqrt($"bd")),
      sum(mysql_sqrt($"f")), sum(mysql_sqrt($"i"))).head()
    assert(math.abs(r.getDouble(0) - 1.1) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.2) < 1e-12)
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 2.0)
    // MySQL: sqrt of a negative is NULL, not NaN
    assert(t.select(mysql_sqrt($"f" * -1.0)).head().isNullAt(0))
  }

  test("ceil_floor.test: every numeric width, halves and negatives") {
    import org.apache.spark.sql.types.DecimalType
    // expr/ceil_floor.test second table rows verbatim (decimal(40+)
    // columns capped at the engine's 38-digit maximum)
    // the fixture inserts 2 (not 2.5) into the scale-0 column b
    val vals = Seq("2.5" -> "2", "2" -> "2", "-2" -> "-2",
      "999" -> "999", "-999" -> "-999")
    val t = vals.map { case (v, b) => (BigDecimal(v), BigDecimal(b)) }
      .toDF("v", "vb").select(
      $"v".cast(DecimalType(8, 2)).as("a"),
      $"vb".cast(DecimalType(15, 0)).as("b"),
      $"v".cast(DecimalType(19, 1)).as("c"),
      $"v".cast(DecimalType(38, 2)).as("d"),
      $"v".cast(DecimalType(38, 30)).as("e"),
      $"v".cast("double").as("ff"),
      $"v".cast("int").as("ii"))
    val got = t.select(
      floor($"a"), ceil($"a"), floor($"b"), ceil($"b"),
      floor($"c"), ceil($"c"), floor($"d"), ceil($"d"),
      floor($"e"), ceil($"e"), floor($"ii"), ceil($"ii"))
      .collect().map(_.toSeq.map(_.toString.toDouble.toLong))
    val expect = Seq(
      Seq(2L, 3L, 2L, 2L, 2L, 3L, 2L, 3L, 2L, 3L, 2L, 2L),
      Seq(2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L),
      Seq(-2L, -2L, -2L, -2L, -2L, -2L, -2L, -2L, -2L, -2L, -2L, -2L),
      Seq(999L, 999L, 999L, 999L, 999L, 999L, 999L, 999L, 999L, 999L, 999L, 999L),
      Seq(-999L, -999L, -999L, -999L, -999L, -999L, -999L, -999L, -999L, -999L, -999L, -999L))
    assert(got.toSeq === expect)
  }

  test("ifnull.test: three-valued NOT over ifnull(a > b, null)") {
    // expr/ifnull.test rows verbatim: comparisons with NULL stay NULL
    // through ifnull and NOT, so the WHERE filter drops every row
    val t = Seq((Some(1), Option.empty[Int]), (Option.empty[Int], Some(1)))
      .toDF("a", "b")
    assert(t.where(!coalesce($"a" > $"b", lit(null))).count() === 0)
    val r = t.select($"a" > $"b", coalesce($"a" > $"b", lit(null)),
      !coalesce($"a" > $"b", lit(null))).collect()
    assert(r.forall(row => row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2)))
  }

  test("trim.test: remstr is an exact repeated string, not a char set") {
    // expr/trim.test rows verbatim — ' x' must trim as a TWO-CHAR unit
    val t = Seq(("xxaxx", "x"), (" xxaxx", "x"), (" x x axx", " x"),
      ("测试xx测试", "测试"), ("测试xx测试", "测")).toDF("a", "b")
    assert(strs(t.select(trim($"a"))) ===
      Seq("xxaxx", "xxaxx", "x x axx", "测试xx测试", "测试xx测试"))
    assert(strs(t.select(mysql_trim($"b", $"a"))) ===
      Seq("a", " xxa", " axx", "xx", "试xx测试"))
    assert(strs(t.select(mysql_trim(lit("x"), $"a"))) ===
      Seq("a", " xxa", " x x a", "测试xx测试", "测试xx测试"))
    assert(strs(t.select(ltrim($"a"))) ===
      Seq("xxaxx", "xxaxx", "x x axx", "测试xx测试", "测试xx测试"))
    assert(strs(t.select(mysql_trim($"b", $"a", "LEADING"))) ===
      Seq("axx", " xxaxx", " axx", "xx测试", "试xx测试"))
    assert(strs(t.select(mysql_trim(lit("x"), $"a", "LEADING"))) ===
      Seq("axx", " xxaxx", " x x axx", "测试xx测试", "测试xx测试"))
    assert(strs(t.select(mysql_trim($"b", $"a", "BOTH"))) ===
      Seq("a", " xxa", " axx", "xx", "试xx测试"))
  }
}
