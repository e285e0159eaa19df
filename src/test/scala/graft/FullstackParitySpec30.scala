package graft

import org.apache.spark.sql.functions._

/** Thirtieth tranche: the delta-merge decimal aggregate matrix
  * (`/root/reference/tests/delta-merge-test/query/data_type/decimal/
  * agg.test`): count / exact distinct / min / max / sum / avg over the
  * same values at four scales — sum keeps the column scale, avg widens
  * it by MySQL's div_precision_increment (scale+4, reproduced through
  * `MySqlCompat.mysql_div`). */
class FullstackParitySpec30 extends SparkTestBase {
  import spark.implicits._
  import graft.functions.MySqlCompat.mysql_div

  private val raw = Seq("3.1416", "3.1222", "3.1416", "-3.1222", "0.0000")
  // the same logical values stored at scales 4 / 2 / 3 / 5 (d3/d4 differ
  // per row in the fixture: 3.145, 3.122, 3.141, -3.122, 0.000 …)
  private val d3v = Seq("3.145", "3.122", "3.141", "-3.122", "0.000")
  private val d4v = Seq("3.14567", "3.12222", "3.14161", "-3.12222", "0.00000")

  test("decimal/agg.test: count, exact distinct, min/max/sum at the column scale") {
    val t = raw.zip(d3v).zip(d4v).map { case ((d, d3), d4) => (d, d3, d4) }
      .toDF("ds", "d3s", "d4s")
      .select(
        $"ds".cast("decimal(10,4)").as("d"),
        $"ds".cast("decimal(10,2)").as("d2"),
        $"d3s".cast("decimal(10,3)").as("d3"),
        $"d4s".cast("decimal(10,5)").as("d4"))
    val c = t.agg(count($"d"), count($"d2"), count($"d3"), count($"d4"))
      .collect().head
    assert((0 to 3).map(c.getLong) === Seq(5L, 5L, 5L, 5L))
    val u = t.agg(countDistinct($"d"), countDistinct($"d2"),
        countDistinct($"d3"), countDistinct($"d4")).collect().head
    assert((0 to 3).map(u.getLong) === Seq(4L, 4L, 5L, 5L))
    val mm = t.agg(
        min($"d").cast("string"), max($"d").cast("string"),
        sum($"d").cast("decimal(12,4)").cast("string"),
        min($"d2").cast("string"), max($"d2").cast("string"),
        sum($"d2").cast("decimal(12,2)").cast("string"),
        sum($"d3").cast("decimal(12,3)").cast("string"),
        sum($"d4").cast("decimal(12,5)").cast("string"))
      .collect().head
    assert(mm.getString(0) === "-3.1222" && mm.getString(1) === "3.1416")
    assert(mm.getString(2) === "6.2832")
    assert(mm.getString(3) === "-3.12" && mm.getString(4) === "3.14")
    assert(mm.getString(5) === "6.28")
    assert(mm.getString(6) === "6.286")
    assert(mm.getString(7) === "6.28728")
  }

  test("decimal/agg.test: avg widens the scale by div_precision_increment") {
    val t = raw.zip(d3v).zip(d4v).map { case ((d, d3), d4) => (d, d3, d4) }
      .toDF("ds", "d3s", "d4s")
      .select(
        $"ds".cast("decimal(10,4)").as("d"),
        $"ds".cast("decimal(10,2)").as("d2"),
        $"d3s".cast("decimal(10,3)").as("d3"),
        $"d4s".cast("decimal(10,5)").as("d4"))
    val a = t.agg(
        mysql_div(sum($"d"), count($"d"), scaleA = 4).cast("string"),
        mysql_div(sum($"d2"), count($"d2"), scaleA = 2).cast("string"),
        mysql_div(sum($"d3"), count($"d3"), scaleA = 3).cast("string"),
        mysql_div(sum($"d4"), count($"d4"), scaleA = 5).cast("string"))
      .collect().head
    assert(a.getString(0) === "1.25664000")
    assert(a.getString(1) === "1.256000")
    assert(a.getString(2) === "1.2572000")
    assert(a.getString(3) === "1.257456000")
  }

  test("decimal/arithmetic.test: +,-,×,÷ with the MySQL division scale") {
    import graft.functions.MySqlCompat.mysql_div
    val t = Seq(("9", "99"), ("-9", "-99")).toDF("s1", "s2")
      .select($"s1".cast("decimal(10,0)").as("d1"), $"s2".cast("decimal(10,0)").as("d2"))
    val got = t.select(
      ($"d1" + $"d2").cast("long"), ($"d1" - $"d2").cast("long"),
      ($"d1" * $"d2").cast("long"),
      mysql_div($"d1", $"d2", scaleA = 0).cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === Seq((108L, -90L, 891L, "0.0909"), (-108L, 90L, 891L, "0.0909")))
  }

  test("mydatetime/compare.test: fractional-second compare and zero-component ordering") {
    // zero-component datetimes ride the q100 string-sentinel convention:
    // '1991-00-00 …' sorts before every real 1991-09 datetime, exactly
    // as MyDateTime's packed ordering does
    val vals = Seq("1991-09-05 11:11:11.00000", "1991-09-05 11:11:11.12300",
      "1991-00-00 11:11:11.00000")
    val t = vals.toDF("a")
    assert(t.orderBy($"a").collect().map(_.getString(0)).toSeq === Seq(
      "1991-00-00 11:11:11.00000", "1991-09-05 11:11:11.00000",
      "1991-09-05 11:11:11.12300"))
    // fractional seconds distinguish otherwise-equal datetimes
    assert(t.where($"a" > "1991-09-05 11:11:11.00000")
      .collect().map(_.getString(0)).toSeq === Seq("1991-09-05 11:11:11.12300"))
    assert(t.where($"a" < "1991-01-01 00:00:00.00000").count() === 1L) // the zero date
    // real timestamps compare with sub-second resolution too
    val real = Seq("1991-09-05 11:11:11", "1991-09-05 11:11:11.123").toDF("s")
      .select($"s".cast("timestamp").as("ts"))
    assert(real.agg(max($"ts").cast("string")).collect().head.getString(0)
      === "1991-09-05 11:11:11.123")
  }
}
