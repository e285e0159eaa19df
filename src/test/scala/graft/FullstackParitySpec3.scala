package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Third tranche of reference fullstack transcripts
  * (`/root/reference/tests/fullstack-test/expr/<name>.test`) mirrored
  * verbatim: the q153 bit/string-construction family on the exact
  * fixture rows the reference runs, including the edge rows the TPC-H
  * tables cannot produce (Long.MinValue bins, 16 MiB SPACE cap,
  * negative/NULL ELT indexes). */
class FullstackParitySpec3 extends SparkTestBase {
  import spark.implicits._

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("elt.test: per-row and constant indexes, NULL/out-of-range -> NULL") {
    // expr/elt.test t rows verbatim (multibyte strings included)
    val t = Seq(
      (Some(-1), Some("abc"), Some("def")),
      (Some(0), Some("▲α▼βγ➨δε☎ζη✂θι€κλ♫μν✓ξο✚πρ℉στ♥υφ♖χψ♘ω★σ✕"), Some("hello world")),
      (Some(1), Some("թփձջրչճժծքոեռտըւիօպասդֆգհյկլխզղցվբնմշ"), Some("world hello")),
      (Some(2), None: Option[String], Some("11111")),
      (Some(3), None: Option[String], Some("11111")))
      .toDF("a", "b", "c")

    assert(strs(t.select(mysql_elt($"a", $"b", $"c")))
      === Seq(null, null, "թփձջրչճժծքոեռտըւիօպասդֆգհյկլխզղցվբնմշ", "11111", null))
    assert(strs(t.select(mysql_elt(lit(null).cast("int"), $"b", $"c")))
      === Seq(null, null, null, null, null))
    assert(strs(t.select(mysql_elt(lit(-1), $"b", $"c")))
      === Seq(null, null, null, null, null))
    assert(strs(t.select(mysql_elt(lit(0), $"b", $"c")))
      === Seq(null, null, null, null, null))
    assert(strs(t.select(mysql_elt(lit(1), $"b", $"c")))
      === Seq("abc", "▲α▼βγ➨δε☎ζη✂θι€κλ♫μν✓ξο✚πρ℉στ♥υφ♖χψ♘ω★σ✕",
        "թփձջրչճժծքոեռտըւիօպասդֆգհյկլխզղցվբնմշ", null, null))
    assert(strs(t.select(mysql_elt(lit(2), $"b", $"c")))
      === Seq("def", "hello world", "world hello", "11111", "11111"))
    assert(strs(t.select(mysql_elt(lit(3), $"b", $"c")))
      === Seq(null, null, null, null, null))
  }

  test("bin.test: signed two's-complement and unsigned-max bit strings") {
    // expr/bin.test t1 (signed bigint) rows verbatim
    val t1 = Seq(Some(0L), Some(1L), Some(44L), Some(100L),
      Some(Long.MinValue), Some(Long.MaxValue), None).toDF("c1")
    assert(strs(t1.select(bin($"c1"))) === Seq(
      "0", "1", "101100", "1100100",
      "1000000000000000000000000000000000000000000000000000000000000000",
      "111111111111111111111111111111111111111111111111111111111111111",
      null))
    // t2 (unsigned bigint): 18446744073709551615 IS -1L bit-for-bit
    val t2 = Seq(Some(0L), Some(1L), Some(44L), Some(100L), Some(-1L), None)
      .toDF("c1")
    assert(strs(t2.select(bin($"c1"))) === Seq(
      "0", "1", "101100", "1100100",
      "1111111111111111111111111111111111111111111111111111111111111111",
      null))
  }

  test("hex_int.test: int/double/decimal/bigint hex with MySQL round-first") {
    // expr/hex_int.test t rows verbatim: (a int, b double, c decimal(5,2),
    // d bigint). MySQL hexes non-integers by rounding to BIGINT first
    // (half away from zero), negatives as 64-bit two's complement.
    val t = Seq(
      (12345, Some(123.45), BigDecimal("123.45"), Long.MaxValue),
      (12345, None, BigDecimal("-123.45"), Long.MaxValue))
      .toDF("a", "b", "c", "d")
    def hexNum(c: org.apache.spark.sql.Column) =
      hex(round(c.cast("double")).cast("long"))
    val got = t.select(hex($"a"), hexNum($"b"), hexNum($"c"), hex($"d"))
      .collect().map(r => (0 to 3).map(i =>
        if (r.isNullAt(i)) null else r.getString(i)).toList).toList
    assert(got === List(
      List("3039", "7B", "7B", "7FFFFFFFFFFFFFFF"),
      List("3039", null, "FFFFFFFFFFFFFF85", "7FFFFFFFFFFFFFFF")))
  }

  test("hex_str.test: UTF-8 byte hex incl. CJK, emoji and ZWJ sequences") {
    // expr/hex_str.test t rows + expected outputs verbatim
    val rows = Seq(Some("www.pingcap.com"), Some("abcd"),
      Some("测试测试测试测试abcd测试"), None, Some("さらに入"),
      Some("测试测试测试测试abcd测试"), Some(""), Some("🍻"),
      Some("🏴‍☠️"), Some("\t"), Some("\n"))
    val got = strs(rows.toDF("a").select(hex($"a")))
    assert(got === Seq(
      "7777772E70696E676361702E636F6D",
      "61626364",
      "E6B58BE8AF95E6B58BE8AF95E6B58BE8AF95E6B58BE8AF9561626364E6B58BE8AF95",
      null,
      "E38195E38289E381ABE585A5",
      "E6B58BE8AF95E6B58BE8AF95E6B58BE8AF95E6B58BE8AF9561626364E6B58BE8AF95",
      "",
      "F09F8DBB",
      "F09F8FB4E2808DE298A0EFB88F",
      "09",
      "0A"))
  }

  test("space.test: negatives clamp to '', 16 MiB packet cap -> NULL") {
    // expr/space.test t rows verbatim; length(space(a)) expected column
    val t = Seq(Some(-1), Some(0), None, Some(10), Some(16777216),
      Some(16777217)).toDF("a")
    val got = t.select(length(mysql_space($"a"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
    assert(got === Seq(0, 0, null, 10, 16777216, null))
  }
}
