package graft

import org.apache.spark.sql.functions._

/** Thirty-second tranche: the delta-merge collator suite
  * (`/root/reference/tests/delta-merge-test/query/misc/collator.test`):
  * the same 7-row fixture filtered under utf8mb4_general_ci
  * (collator -45 → Spark 4 UTF8_LCASE) and under binary collation —
  * CI equality / range / IN / LIKE fold case, binary compares bytes. */
class FullstackParitySpec32 extends SparkTestBase {
  import spark.implicits._

  private def t = Seq(
    ("aaa", "bbb"), ("AAA", "bbb"), ("aaa", "BBB"), ("AAA", "BBB"),
    ("Aab", "bBa"), ("bAb", "ABa"), ("bbA", "AAB")).toDF("col_1", "col_2")

  private def ci(c: String) = expr(s"collate($c, 'UTF8_LCASE')")

  test("collator.test -45 (general_ci): equality / range / IN / LIKE fold case") {
    assert(t.where(ci("col_1") === lit("aaa")).count() === 4L) // aaa ×2, AAA ×2
    assert(t.where(ci("col_2") > lit("aaa")).count() === 7L)   // every col_2 folds above 'aaa'
    assert(t.where(ci("col_1") < lit("BBB")).count() === 7L)   // every col_1 folds below 'bbb'
    val in = t.where(ci("col_1").isin("aaa", "aab", "bbb"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(in === Seq("AAA", "AAA", "Aab", "aaa", "aaa"))
    val like = t.where(lower($"col_1").like("aa%"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(like === Seq("AAA", "AAA", "Aab", "aaa", "aaa"))
    // CI min/max are well-defined up to case folding
    val mm = t.agg(min(ci("col_1")), max(ci("col_1")), max(ci("col_2")))
      .collect().head
    assert(mm.getString(0).toLowerCase === "aaa")
    assert(mm.getString(1).toLowerCase === "bba")
    assert(mm.getString(2).toLowerCase === "bbb")
  }

  test("collator.test binary: bytes compare, case matters") {
    assert(t.where($"col_1" === "aaa").count() === 2L)
    // binary '<BBB': uppercase-led values only (0x41 'A' < 0x42 'B' < 0x61 'a')
    val lt = t.where($"col_1" < "BBB").collect().map(_.getString(0)).sorted.toSeq
    assert(lt === Seq("AAA", "AAA", "Aab"))
    assert(t.where($"col_1".isin("aaa", "aab", "bbb")).count() === 2L)
    assert(t.where($"col_1".like("aa%")).count() === 2L)
    val mm = t.agg(min($"col_1"), max($"col_1"), min($"col_2"), max($"col_2"))
      .collect().head
    assert(mm.getString(0) === "AAA" && mm.getString(1) === "bbA")
    assert(mm.getString(2) === "AAB" && mm.getString(3) === "bbb")
  }
}
