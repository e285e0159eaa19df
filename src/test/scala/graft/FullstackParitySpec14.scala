package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Fourteenth tranche of reference fullstack transcripts mirrored
  * verbatim (`/root/reference/tests/fullstack-test/expr/<name>.test`):
  * datetime→decimal casts that SATURATE when the integer digits don't
  * fit (cast_as_decimal), datetime→TIME(s) casts with fractional
  * rounding carry and date→00:00:00 (cast_as_duration), decimal(22,21)
  * →double IEEE-nearest round trips (cast_decimal_as_real), the
  * count/sum/min/max × {literal, non-null col, nullable col, NULL}
  * matrix over a filter-emptied input (empty_input_for_udaf), and
  * ifnull-truthiness as a WHERE predicate
  * (single_ifnull_in_predicate). */
class FullstackParitySpec14 extends SparkTestBase {
  import spark.implicits._

  test("cast_as_decimal.test: datetime saturates at decimal(16,3), fits at (17,3)") {
    // the single fixture row '2022-10-10 10:10:10.12345' verbatim;
    // its numeric form 20221010101010.12345 has 14 integer digits, so
    // decimal(16,3) (13 integer digits) saturates at all-nines while
    // (17,3) and (18,3) round the fraction to .123
    val t = Seq("2022-10-10 10:10:10.12345").toDF("s")
      .select(to_timestamp($"s").as("c1"))
    val row = t.select(
      mysql_cast_decimal(mysql_time_number($"c1"), 16, 3).cast("string").as("d16"),
      mysql_cast_decimal(mysql_time_number($"c1"), 17, 3).cast("string").as("d17"),
      mysql_cast_decimal(mysql_time_number($"c1"), 18, 3).cast("string").as("d18"))
      .collect().head
    assert(row.getString(0) === "9999999999999.999")
    assert(row.getString(1) === "20221010101010.123")
    assert(row.getString(2) === "20221010101010.123")
  }

  test("cast_as_decimal.test: default decimal is (10,0) and rounds half-away") {
    // cast(-0.741 as decimal) → -1, and the int-division row
    // cast(-1113200806 / 1486109909 as decimal) → -1 verbatim
    val t = Seq((-1113200806L, 1486109909L)).toDF("c2", "c1")
    val row = t.select(
      mysql_cast_decimal(lit(java.math.BigDecimal.valueOf(-0.741)), 10, 0)
        .cast("string").as("a"),
      mysql_cast_decimal($"c2" / $"c1", 10, 0).cast("string").as("b"))
      .collect().head
    assert(row.getString(0) === "-1")
    assert(row.getString(1) === "-1")
  }

  test("cast_as_duration.test: date → TIME(s) is all zeros, NULL passes") {
    val t = Seq(Some("2022-01-01"), None).toDF("s")
      .select($"s".cast("date").cast("timestamp").as("c1"))
    val got = t.select(
      mysql_cast_time($"c1", 2).as("t2"),
      mysql_cast_time($"c1", 4).as("t4"),
      mysql_cast_time($"c1", 5).as("t5"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.contains(("00:00:00.00", "00:00:00.0000", "00:00:00.00000")))
    assert(got.contains((null, null, null)))
  }

  test("cast_as_duration.test: datetime(4) → TIME(2/4/5) rounds with carry") {
    // the five datetime(4) fixture rows verbatim; scale 2 rounds
    // HALF_UP (.1255 → .13) and carries (.9999 → :12.00), scale 5
    // zero-pads the stored 4-digit fraction
    val rows = Seq(
      ("2022-09-20 11:11:11.0000", "11:11:11.00", "11:11:11.0000", "11:11:11.00000"),
      ("2022-09-20 11:11:11.1111", "11:11:11.11", "11:11:11.1111", "11:11:11.11110"),
      ("2022-09-20 11:11:11.1234", "11:11:11.12", "11:11:11.1234", "11:11:11.12340"),
      ("2022-09-20 11:11:11.1255", "11:11:11.13", "11:11:11.1255", "11:11:11.12550"),
      ("2022-09-20 11:11:11.9999", "11:11:12.00", "11:11:11.9999", "11:11:11.99990"))
    val t = rows.map(_._1).toDF("s").select(to_timestamp($"s").as("c2"))
    val got = t.select(
      date_format($"c2", "yyyy-MM-dd HH:mm:ss.SSSS").as("k"),
      mysql_cast_time($"c2", 2).as("t2"),
      mysql_cast_time($"c2", 4).as("t4"),
      mysql_cast_time($"c2", 5).as("t5"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    rows.foreach { case (s, e2, e4, e5) =>
      assert(got(s) === ((e2, e4, e5)), s"for $s")
    }
  }

  test("cast_decimal_as_real.test: decimal(22,21) → double is IEEE nearest") {
    // the seven fixture rows verbatim; MySQL renders the shortest
    // round-trip repr, which is exactly Java's Double.toString of the
    // nearest double — including the two pairs that collapse onto
    // 3.124159 from either side
    val inputs = Seq("-1.0", "0.0",
      "3.124159000000000352410", "3.124159000000000352420",
      "3.124158999999999908325", "3.124158999999999908326")
    val t = inputs.toDF("s").select($"s".cast("decimal(22,21)").as("c1"))
    val got = t.select($"c1".cast("double").as("d"))
      .collect().map(r => java.lang.Double.toString(r.getDouble(0))).sorted
    val expected = Seq("-1.0", "0.0",
      "3.124159", "3.124159",
      "3.1241589999999997", "3.1241590000000006").sorted
    assert(got === expected)
    // NULL row passes through
    assert(Seq[Option[String]](None).toDF("s")
      .select($"s".cast("decimal(22,21)").cast("double")).collect().head.isNullAt(0))
  }

  test("empty_input_for_udaf.test: keyless agg matrix over emptied vs kept input") {
    // rows (1,1,1,1,1,1) and (1,2,3,NULL,NULL,1) verbatim; a > 10
    // empties the input — count stays 0, sum/min/max go NULL; a <= 10
    // keeps both — count skips NULLs, count(NULL) is always 0
    val t = Seq((1, Some(1), Some(1), Option(1)), (1, Some(2), Some(3), None))
      .toDF("a", "b", "c", "d")
    def probe(pred: org.apache.spark.sql.Column) = t.filter(pred).agg(
      count(lit(1)).as("c1"), count($"a").as("ca"), count($"b").as("cb"),
      count($"d").as("cd"), count(lit(null)).as("cn"),
      sum(lit(1)).as("s1"), sum($"a").as("sa"), sum($"b").as("sb"),
      sum($"d").as("sd"), sum(lit(null).cast("int")).as("sn"),
      min(lit(1)).as("m1"), min($"a").as("ma"), min($"d").as("md"),
      max($"b").as("xb"), max($"d").as("xd")).collect().head
    val empty = probe($"a" > 10)
    assert((empty.getLong(0), empty.getLong(1), empty.getLong(2),
      empty.getLong(3), empty.getLong(4)) === ((0L, 0L, 0L, 0L, 0L)))
    assert((5 until 15).forall(empty.isNullAt), "sum/min/max over empty are NULL")
    val kept = probe($"a" <= 10)
    assert((kept.getLong(0), kept.getLong(1), kept.getLong(2),
      kept.getLong(3), kept.getLong(4)) === ((2L, 2L, 2L, 1L, 0L)))
    assert((kept.getLong(5), kept.getLong(6), kept.getLong(7), kept.getLong(8))
      === ((2L, 2L, 3L, 1L)))
    assert(kept.isNullAt(9), "sum(NULL) is NULL even over rows")
    assert((kept.getInt(10), kept.getInt(11), kept.getInt(12),
      kept.getInt(13), kept.getInt(14)) === ((1, 1, 1, 2, 1)))
  }

  test("single_ifnull_in_predicate.test: ifnull(c1, c2) as a truthiness filter") {
    // rows (1,123),(NULL,234),(NULL,0) verbatim: ifnull yields
    // 1/234/0 — MySQL keeps the nonzero rows
    val t = Seq((Some(1), 123L), (None, 234L), (None, 0L)).toDF("c1", "c2")
    val kept = t.filter(mysql_istrue(coalesce($"c1".cast("long"), $"c2")) === 1)
      .select($"c2").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(123L, 234L))
  }
}
