package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixteenth tranche of reference fullstack transcripts mirrored
  * verbatim (`/root/reference/tests/fullstack-test/expr/<name>.test`):
  * LEAD/LAG with constant, type-coerced, and NON-CONSTANT (column)
  * defaults plus literal inputs (lead_lag.test), LIKE with a column
  * pattern and custom ESCAPE characters (like.test), and
  * UNIX_TIMESTAMP over date/datetime (wall-clock, shifts with the
  * session tz) vs timestamp(3)/(6) (instant, tz-invariant) including
  * the fractional-scale rendering (unixTimeStamp.test). */
class FullstackParitySpec16 extends SparkTestBase {
  import spark.implicits._

  private val w = Window.partitionBy($"part").orderBy($"orde")

  test("lead_lag.test: constant and type-coerced defaults over the str fixture") {
    // the eight test_str rows verbatim; '' and NULL are distinct
    val t = Seq((1L, 1L, Some("1")), (1L, 2L, Some("")), (1L, 3L, Some("3")),
      (1L, 4L, Some("4")), (2L, 5L, Some("5")), (2L, 6L, None),
      (2L, 7L, Some("7")), (2L, 8L, Some("8")))
      .toDF("part", "orde", "value_str")
    val got = t.select($"orde",
        lead($"value_str", 1, "default").over(w).as("ld_s"),
        lead($"value_str", 1, 123).over(w).as("ld_n"),
        lag($"value_str", 1, "default").over(w).as("lg_s"),
        lag($"value_str", 1, 123).over(w).as("lg_n"))
      .orderBy($"orde").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    // transcript order: rows 1..8 — 123 coerces to the string '123'
    assert(got.toSeq === Seq(
      ("", "", "default", "123"),
      ("3", "3", "1", "1"),
      ("4", "4", "", ""),
      ("default", "123", "3", "3"),
      (null, null, "default", "123"),
      ("7", "7", "5", "5"),
      ("8", "8", null, null),
      ("default", "123", "7", "7")))
  }

  test("lead_lag.test: non-constant (column) default and literal input") {
    val t = Seq((1L, 1L, Some("1")), (1L, 2L, Some("")), (1L, 3L, Some("3")),
      (1L, 4L, Some("4")), (2L, 5L, Some("5")), (2L, 6L, None),
      (2L, 7L, Some("7")), (2L, 8L, Some("8")))
      .toDF("part", "orde", "value_str")
    // lead(value_str, 1, value_str): default falls back to the row's own
    val self = t.select($"orde", lead($"value_str", 1, $"value_str").over(w))
      .orderBy($"orde").collect().map(_.getString(1))
    assert(self.toSeq === Seq("", "3", "4", "4", null, "7", "8", "8"))
    // lead('5', 1): NULL only past the partition end
    val lit5 = t.select($"orde", lead(lit("5"), 1).over(w))
      .orderBy($"orde").collect().map(_.getString(1))
    assert(lit5.toSeq === Seq("5", "5", "5", null, "5", "5", "5", null))
    // lead('5', 2, value_str): constant input, column default at the tail
    val mix = t.select($"orde", lead(lit("5"), 2, $"value_str").over(w))
      .orderBy($"orde").collect().map(_.getString(1))
    assert(mix.toSeq === Seq("5", "5", "3", "4", "5", "5", "7", "8"))
  }

  test("lead_lag.test: int fixture — partition-boundary defaults keep the value type") {
    val t = Seq((1L, 1L, Some(1L)), (1L, 2L, Some(0L)), (1L, 3L, Some(999999L)),
      (1L, 4L, Some(-4L)), (2L, 5L, Some(5L)), (2L, 6L, None),
      (2L, 7L, Some(-999999L)), (2L, 8L, Some(8L)))
      .toDF("part", "orde", "value_bigint")
    val got = t.select($"orde",
        lead($"value_bigint", 1, -100).over(w).as("ld"),
        lag($"value_bigint", 1, -100).over(w).as("lg"))
      .orderBy($"orde").collect()
      .map(r => (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
        if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))))
    // the default fills only PAST the partition edge; a stored NULL
    // neighbor (orde 6) surfaces as NULL, exactly as the transcript
    assert(got.toSeq === Seq(
      (0L, -100L), (999999L, 1L), (-4L, 0L), (-100L, 999999L),
      (null, -100L), (-999999L, 5L), (8L, null), (-100L, -999999L)))
  }

  test("like.test: column pattern and literal-vs-column forms") {
    val t = Seq(("aaaa", "bbbb"), ("aaaa", "%a%")).toDF("a", "b")
    assert(t.filter($"a".like("%a%")).count() === 2L)
    val colPat = t.filter(expr("a like b")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(colPat.toSeq === Seq(("aaaa", "%a%")))
    val litLhs = t.filter(expr("'a' like b")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(litLhs.toSeq === Seq(("aaaa", "%a%")))
  }

  test("like.test: custom ESCAPE characters, MySQL lax semantics") {
    // fixture row '1234'; escape makes the NEXT char literal (any char,
    // and a trailing escape char matches itself — MySQL is laxer than
    // ANSI here, so this runs through mysql_like_escape rather than
    // Spark's strict LIKE ... ESCAPE)
    import graft.functions.MySqlCompat.mysql_like_escape
    val t = Seq("aaaa", "aaaa", "1234").toDF("a")
    assert(t.filter(mysql_like_escape($"a", "1234", '4'))
      .collect().map(_.getString(0)).toSeq === Seq("1234"),
      "trailing escape char matches itself")
    assert(t.filter(mysql_like_escape($"a", "1234", '2')).count() === 0L,
      "escape '2' makes '3' literal -> pattern '134' matches nothing")
    assert(t.filter(mysql_like_escape($"a", "15234", '5'))
      .collect().map(_.getString(0)).toSeq === Seq("1234"))
    assert(t.filter(mysql_like_escape($"a", "_223_", '2'))
      .collect().map(_.getString(0)).toSeq === Seq("1234"))
  }

  test("unixTimeStamp.test: wall-clock types shift with session tz, instants don't") {
    // the three fixture rows; a=date, b=datetime (both wall-clock),
    // c=timestamp(3), d=timestamp(6) (instants, inserted under UTC)
    val rows = Seq("2021-05-23 11:45:14", "2021-05-23 11:45:14.192",
      "2021-05-23 11:45:14.191981")
    val t = rows.toDF("s").select(
      to_timestamp($"s").cast("date").as("a"),
      date_trunc("second", to_timestamp($"s")).as("b"),
      // timestamp(3) rounds the stored fraction to milliseconds
      timestamp_micros(((unix_micros(to_timestamp($"s")) + 500) / 1000).cast("long") * 1000)
        .as("c"),
      to_timestamp($"s").as("d"))
    def unixWall(c: org.apache.spark.sql.Column, tz: String) =
      unix_micros(to_utc_timestamp(c, tz)).divide(1000000L).cast("long")
    // +0:00 — the transcript's first matrix
    val utc = t.select(unixWall($"a".cast("timestamp"), "+00:00"),
        unixWall($"b", "+00:00"),
        (unix_micros($"c").cast("decimal(26,6)") / 1000000L).cast("decimal(16,3)"),
        (unix_micros($"d").cast("decimal(26,6)") / 1000000L).cast("decimal(16,6)"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString))
    assert(utc.toSeq === Seq(
      (1621728000L, 1621770314L, "1621770314.000", "1621770314.000000"),
      (1621728000L, 1621770314L, "1621770314.192", "1621770314.192000"),
      (1621728000L, 1621770314L, "1621770314.192", "1621770314.191981")))
    // +1:00 — wall-clock columns move back one hour of epoch, instants fixed
    val plus1 = t.select(unixWall($"a".cast("timestamp"), "+01:00"),
        unixWall($"b", "+01:00"),
        (unix_micros($"c").cast("decimal(26,6)") / 1000000L).cast("decimal(16,3)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString))
    assert(plus1.toSeq === Seq(
      (1621724400L, 1621766714L, "1621770314.000"),
      (1621724400L, 1621766714L, "1621770314.192"),
      (1621724400L, 1621766714L, "1621770314.192")))
    // the filter forms verbatim
    assert(t.filter(unixWall($"a".cast("timestamp"), "+00:00") === 1621728000L)
      .count() === 3L)
    assert(t.filter(unixWall($"a".cast("timestamp"), "+01:00") === 1621724400L)
      .count() === 3L)
    assert(t.filter(unixWall($"b", "+00:00") === 1621770314L).count() === 3L)
  }
}
