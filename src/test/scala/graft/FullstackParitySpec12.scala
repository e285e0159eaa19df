package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Twelfth tranche of reference fullstack transcripts mirrored
  * verbatim (`/root/reference/tests/fullstack-test/expr/<name>.test`):
  * EXTRACT's compound datetime units (extract_datetime), EXTRACT over
  * signed >24h durations (extract_duration), CAST to DATETIME(s) with
  * fractional-second rounding CARRY and non-date-shaped numerics → NULL
  * (cast_as_time), decimal truthiness in WHERE over empty input
  * (special_new_decimal_type), cast nullability through lpad(NULL) and
  * expression group keys (cast_nullability), and the empty-group
  * any_value/sum/count matrix (duplicate_column). */
class FullstackParitySpec12 extends SparkTestBase {
  import spark.implicits._

  test("extract_datetime.test: simple and compound units on datetime(6)") {
    // the single fixture row '2021-03-13 12:34:56.123456' verbatim
    val t = Seq("2021-03-13 12:34:56.123456").toDF("s")
      .select(to_timestamp($"s").as("a"))
    val matched = t.filter(
      mysql_extract_dt("YEAR", $"a") === 2021 &&
        mysql_extract_dt("MONTH", $"a") === 3 &&
        mysql_extract_dt("WEEK", $"a") === 10 &&
        mysql_extract_dt("DAY", $"a") === 13)
    assert(matched.count() === 1)
    val matched2 = t.filter(
      mysql_extract_dt("DAY_MICROSECOND", $"a") === 13123456123456L &&
        mysql_extract_dt("DAY_SECOND", $"a") === 13123456L &&
        mysql_extract_dt("DAY_MINUTE", $"a") === 131234L &&
        mysql_extract_dt("DAY_HOUR", $"a") === 1312L &&
        mysql_extract_dt("YEAR_MONTH", $"a") === 202103L)
    assert(matched2.count() === 1)
  }

  test("extract_duration.test: signed duration units, DAY_* = HOUR_* for TIME") {
    // '838:34:56.123456' and its negation, microseconds-encoded
    val usOf = (h: Long, m: Long, s: Long, f: Long) =>
      ((h * 60 + m) * 60 + s) * 1000000L + f
    val pos = usOf(838, 34, 56, 123456)
    val t = Seq(pos, -pos).toDF("us")

    val posRow = t.filter(
      mysql_extract_dur("HOUR", $"us") === 838 &&
        mysql_extract_dur("MINUTE", $"us") === 34 &&
        mysql_extract_dur("SECOND", $"us") === 56 &&
        mysql_extract_dur("MICROSECOND", $"us") === 123456)
    assert(posRow.collect().map(_.getLong(0)).toSeq === Seq(pos))

    val negRow = t.filter(
      mysql_extract_dur("SECOND_MICROSECOND", $"us") === -56123456L &&
        mysql_extract_dur("MINUTE_MICROSECOND", $"us") === -3456123456L &&
        mysql_extract_dur("MINUTE_SECOND", $"us") === -3456L &&
        mysql_extract_dur("HOUR_MICROSECOND", $"us") === -8383456123456L &&
        mysql_extract_dur("HOUR_SECOND", $"us") === -8383456L &&
        mysql_extract_dur("HOUR_MINUTE", $"us") === -83834L &&
        mysql_extract_dur("DAY_MICROSECOND", $"us") === -8383456123456L &&
        mysql_extract_dur("DAY_SECOND", $"us") === -8383456L &&
        mysql_extract_dur("DAY_MINUTE", $"us") === -83834L &&
        mysql_extract_dur("DAY_HOUR", $"us") === -838L)
    assert(negRow.collect().map(_.getLong(0)).toSeq === Seq(-pos))
  }

  test("cast_as_time.test: DATETIME(s) rounds the fraction HALF_UP with carry") {
    // decimal(20,6) rows verbatim: .123456 rounds to .1235, .999999
    // carries into the next whole second
    val dec = Seq(BigDecimal("20201208111111.999999"),
      BigDecimal("20201208111111.123456")).toDF("a")
      .select($"a".cast("decimal(20,6)").as("a"))
    val d4 = dec.select($"a",
      date_format(mysql_number_to_datetime($"a", 4),
        "yyyy-MM-dd HH:mm:ss.SSSS").as("dt4"))
    assert(d4.filter($"dt4" === "2020-12-08 11:11:11.1235")
      .collect().map(_.getDecimal(0).toPlainString).toSeq ===
      Seq("20201208111111.123456"))
    assert(d4.filter($"dt4" === "2020-12-08 11:11:12.0000")
      .collect().map(_.getDecimal(0).toPlainString).toSeq ===
      Seq("20201208111111.999999"))

    // datetime(6) source row verbatim: same carry through a pure
    // datetime→datetime(4) rounding
    val ts = Seq("2020-12-08 11:11:11.999999").toDF("s")
      .select(to_timestamp($"s").as("a"))
    assert(ts.filter(date_format(mysql_datetime_round($"a", 4),
        "yyyy-MM-dd HH:mm:ss.SSSS") === "2020-12-08 11:11:12.0000")
      .count() === 1)

    // non-date-shaped sources are NULL: time-of-day string, decimals
    // whose digit form names month 13 / day 32, bare yyMMdd int with
    // month 13
    val bad = Seq(("08:45:16", BigDecimal("201302.234500"), 201302))
      .toDF("a", "b", "d")
    // Spark's try_to_timestamp accepts a time-only string (anchoring
    // it to an epoch date); MySQL's datetime cast needs a date part —
    // the date-shape guard is the MySQL semantics under test
    val casted = bad.select(
      try_to_timestamp(nullif(
        regexp_extract($"a", "^\\d{4}-\\d{2}-\\d{2}.*", 0), lit(""))).as("ad"),
      mysql_number_to_datetime($"b", 0).as("bd"),
      mysql_number_to_datetime($"d", 0).as("dd"))
    val r = casted.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("special_new_decimal_type.test: nonzero decimal literal is truthy in WHERE") {
    // empty table: CASE WHEN a THEN isnull(a) ELSE 12.991 END — the
    // count is 0 because there are no rows, not because of truthiness
    val empty = Seq.empty[Int].toDF("a")
    val cnt = empty.filter(mysql_istrue(
        when($"a" =!= 0, isnull($"a").cast("int").cast("decimal(5,3)"))
          .otherwise(lit(BigDecimal("12.991")))) === 1)
      .count()
    assert(cnt === 0)
    // and the truthiness rule itself: 12.991 is true, 0.000 is false,
    // NULL is filtered (the semantics the fixture exercises)
    val vals = Seq(Some(BigDecimal("12.991")), Some(BigDecimal("0.000")), None)
      .toDF("v")
    assert(vals.filter(mysql_istrue($"v") === 1).count() === 1)
  }

  test("cast_nullability.test: lpad over NULL keeps casts NULL; expr group keys") {
    val t = Seq(1, 2).toDF("a")
    // UNION ALL of a NOT NULL column stays 4 rows
    assert(t.union(t).count() === 4)
    // group by cast(a*a as signed)
    val g = t.groupBy(($"a" * $"a").cast("long").as("xx"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"xx").collect()
    assert(g.map(r => (r.getLong(1), r.getLong(0))).toSeq === Seq((1L, 1L), (1L, 4L)))
    // lpad(NULL, 1, 'b') is NULL → every cast of it is NULL
    val t1 = Seq[Option[String]](None).toDF("c1")
    val r = t1.select(
      try_to_timestamp(mysql_lpad($"c1", lit(1), lit("b"))).as("dt"),
      mysql_lpad($"c1", lit(1), lit("b")).cast("decimal(10,0)").as("dec"),
      mysql_cast_signed(mysql_lpad($"c1", lit(1), lit("b"))).as("sg"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("duplicate_column.test: any_value/sum over an empty filter group") {
    val t = Seq((1, 1)).toDF("a", "b")
    // where a = 2 matches nothing: any_value NULL, sum NULL, count 0
    val r0 = t.filter($"a" === 2)
      .agg(any_value($"a").as("av"), sum($"b").as("sb"), count(lit(1)).as("n"))
      .collect().head
    assert(r0.isNullAt(0) && r0.isNullAt(1) && r0.getLong(2) === 0L)
    // after the row (2,1) exists the same aggregate sees it
    val t2 = t.union(Seq((2, 1)).toDF("a", "b"))
    val r1 = t2.filter($"a" === 2)
      .agg(any_value($"a").as("av"), sum($"b").as("sb"), count(lit(1)).as("n"))
      .collect().head
    assert(r1.getInt(0) === 2 && r1.getLong(1) === 1L && r1.getLong(2) === 1L)
    // the join + expression-duplicated group key form, rows verbatim:
    // group by t1.value+1 projected alongside count(*)
    val big = Seq((1, 10)).toDF("id", "value")
    val dim = Seq((1, 15)).toDF("id", "value")
    val j = big.as("t").join(dim.as("t1"),
        col("t.id") === col("t1.id") &&
          col("t.value") + col("t1.value") + 1 > 10)
      .groupBy((col("t1.value") + 1).as("vp"))
      .agg(count(lit(1)).as("n"))
      .select($"n", $"vp").collect()
    assert(j.map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((1L, 16)))
  }
}
