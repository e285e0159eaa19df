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

  test("space.test: negatives clamp to '', 16 MiB packet cap -> NULL") {
    // expr/space.test t rows verbatim; length(space(a)) expected column
    val t = Seq(Some(-1), Some(0), None, Some(10), Some(16777216),
      Some(16777217)).toDF("a")
    val got = t.select(length(mysql_space($"a"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
    assert(got === Seq(0, 0, null, 10, 16777216, null))
  }
}
