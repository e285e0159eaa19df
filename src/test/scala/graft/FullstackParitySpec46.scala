package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat

/** Forty-sixth tranche — the every-token datetime-format fixtures:
  *
  *  - `delta-merge-test/query/expr/date_format.test`: ONE format
  *    string exercising the complete MySQL `%` token surface
  *    (%b %M %m %c %D %d %e %j %H %k %h %I %l %i %p %r %T %S %s %f
  *    %U %u %V %v %a %w %W %X %x %Y %y + literal tail), golden
  *    outputs transcribed verbatim — this drives the calendar tokens
  *    (ordinal day, the four WEEK() modes, week-years, 0=Sunday
  *    weekday) that no JVM pattern can express
  *    (`mysql_date_format_full`).
  *  - `delta-merge-test/query/expr/from_unixtime.test`: FROM_UNIXTIME
  *    over decimal(12,2)/decimal(65,30)/decimal(10,0) epochs rendered
  *    in Asia/Hong_Kong — fractional seconds round half-up to µs, and
  *    the two fixture epochs straddle Hong Kong's 1979-05-13 03:30
  *    DST gap (one second of epoch = one hour and one second of wall
  *    clock).
  */
class FullstackParitySpec46 extends SparkTestBase {
  import spark.implicits._

  private val FullFmt = "%b-%M-%m-%c-%D-%d-%e-%j-%H-%k-%h-%I-%l-%i-%p-%r-" +
    "%T-%S-%s-%f-%U-%u-%V-%v-%a-%w-%W-%X-%x-%Y-%ydd"

  test("date_format.test: the full token matrix over MyDatetime(6) (golden verbatim)") {
    val t = Seq(
      (1, "1988-04-17 01:59:59.123457"),
      (2, "1988-04-17 03:00:00.123456")).toDF("a", "s")
      .withColumn("b", col("s").cast("timestamp"))
    val got = t.select(col("a"),
      MySqlCompat.mysql_date_format_full(col("b"), FullFmt).as("f"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(got(1) === "Apr-April-04-4-17th-17-17-108-01-1-01-01-1-59-AM-" +
      "01:59:59 AM-01:59:59-59-59-123457-16-15-16-15-Sun-0-Sunday-" +
      "1988-1988-1988-88dd")
    assert(got(2) === "Apr-April-04-4-17th-17-17-108-03-3-03-03-3-00-AM-" +
      "03:00:00 AM-03:00:00-00-00-123456-16-15-16-15-Sun-0-Sunday-" +
      "1988-1988-1988-88dd")
  }

  test("date_format.test: fsp0 column renders %f as 000000") {
    val got = Seq("1988-04-17 01:59:59").toDF("s")
      .select(MySqlCompat.mysql_date_format_full(
        col("s").cast("timestamp"), FullFmt)).head().getString(0)
    assert(got === "Apr-April-04-4-17th-17-17-108-01-1-01-01-1-59-AM-" +
      "01:59:59 AM-01:59:59-59-59-000000-16-15-16-15-Sun-0-Sunday-" +
      "1988-1988-1988-88dd")
  }

  test("from_unixtime.test: decimal epochs straddling Hong Kong's 1979 DST gap") {
    val t = Seq(
      (1, "295385399.12", "295385399.123456789098765432123456789", "295385399"),
      (2, "295385400.12", "295385400.123456189098765432123456789", "295385400"))
      .toDF("a", "b", "c", "d")
    def r(colName: String): Map[Int, String] =
      t.select(col("a"), date_format(
        MySqlCompat.mysql_from_unixtime( // (38,29): the repo's p<=38 cap
          col(colName).cast("decimal(38,29)"), "Asia/Hong_Kong"),
        "yyyy-MM-dd HH:mm:ss.SSSSSS").as("f"))
        .collect().map(x => (x.getInt(0), x.getString(1))).toMap
    val rb = r("b")
    assert(rb(1) === "1979-05-13 03:29:59.120000", "+8: one second before the gap")
    assert(rb(2) === "1979-05-13 04:30:00.120000",
      "+9: the epoch one second later lands PAST the 03:30->04:30 DST jump")
    val rc = r("c")
    assert(rc(1) === "1979-05-13 03:29:59.123457", "30-digit decimal rounds half-up to µs")
    assert(rc(2) === "1979-05-13 04:30:00.123456")
    val rd = r("d")
    assert(rd(1) === "1979-05-13 03:29:59.000000")
    assert(rd(2) === "1979-05-13 04:30:00.000000")
  }

  test("from_unixtime.test: 2-arg form with the full token matrix (golden verbatim)") {
    val got = Seq("295385399.12").toDF("b")
      .select(MySqlCompat.mysql_date_format_full(
        MySqlCompat.mysql_from_unixtime(
          col("b").cast("decimal(12,2)"), "Asia/Hong_Kong"), FullFmt))
      .head().getString(0)
    assert(got === "May-May-05-5-13th-13-13-133-03-3-03-03-3-29-AM-" +
      "03:29:59 AM-03:29:59-59-59-120000-19-19-19-19-Sun-0-Sunday-" +
      "1979-1979-1979-79dd")
  }
}
