package graft

import org.apache.spark.sql.functions._

/** Thirty-eighth tranche: delta-merge expression/data-type fixtures
  * mirrored (`/root/reference/tests/delta-merge-test/query/expr/
  * aggregation_uniq.test`, `query/expr/compare_op.test`,
  * `query/data_type/data_type_number.test`): multi-column exact
  * distinct (uniqRawRes) incl. empty-input and NULL-argument
  * semantics, binary string comparison with embedded NUL bytes, and
  * the full numeric boundary matrix per width (unsigned 64-bit rides
  * DECIMAL(20,0) — the SURVEY §1.2 mapping).
  */
class FullstackParitySpec38 extends SparkTestBase {
  import spark.implicits._

  test("aggregation_uniq.test: multi-column exact distinct, empty and NULL inputs") {
    val empty = Seq.empty[(String, Long, String)].toDF("col_1", "col_2", "col_3")
    // keyless uniq over an empty table is ONE row of 0
    assert(empty.select(countDistinct($"col_2")).head().getLong(0) === 0L)
    assert(empty.select(countDistinct($"col_3")).head().getLong(0) === 0L)
    assert(empty.select(countDistinct(lit(null))).head().getLong(0) === 0L)
    // grouped uniq over an empty table emits NO rows
    assert(empty.groupBy($"col_3").agg(countDistinct($"col_2")).isEmpty)

    val t = Seq(("test1", 666L, "111"), ("test2", 666L, "222"),
      ("test3", 777L, "222"), ("test3", 777L, "111"))
      .toDF("col_1", "col_2", "col_3")
    // multi-column distinct, grouped: (col_1,col_2) pairs per col_2
    val g = t.groupBy($"col_2")
      .agg(countDistinct($"col_1", $"col_2").as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g === Set((666L, 2L), (777L, 1L)))
    // multi-column distinct, keyless: 3 distinct (col_1, col_2) pairs
    assert(t.select(countDistinct($"col_1", $"col_2")).head().getLong(0) === 3L)
    val g2 = t.groupBy($"col_1")
      .agg(countDistinct($"col_2").as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(g2 === Set(("test1", 1L), ("test2", 1L), ("test3", 1L)))
  }

  test("compare_op.test: embedded-NUL binary comparison ('y\\0…' sorts after 'y')") {
    val padded = "y" + "\u0000".toString * 6
    val t = Seq(padded).toDF("c1")
    def cnt(p: org.apache.spark.sql.Column) = t.where(p).count()
    // trailing NULs are NOT pad-space: the longer binary string is
    // unequal to and greater than its prefix
    assert(cnt($"c1" === "y") === 0L)
    assert(cnt($"c1" =!= "y") === 1L)
    assert(cnt($"c1" > "y") === 1L)
    assert(cnt($"c1" >= "y") === 1L)
    assert(cnt($"c1" < "y") === 0L)
    assert(cnt($"c1" <= "y") === 0L)
  }

  test("data_type_number.test: per-width numeric boundary values round-trip and filter") {
    val t = Seq(1).toDF("x").select(
      lit(-128).cast("tinyint").as("col_1"),
      lit(255).cast("smallint").as("col_2"), // UInt8 → next signed width
      lit(-32768).cast("smallint").as("col_3"),
      lit(65535).cast("int").as("col_4"), // UInt16 → int
      lit(-2147483648).cast("int").as("col_5"),
      lit(4294967295L).cast("bigint").as("col_6"), // UInt32 → bigint
      lit(Long.MinValue).cast("bigint").as("col_7"),
      lit("18446744073709551615").cast("decimal(20,0)").as("col_8"), // UInt64
      lit(12345.6789f).cast("float").as("col_9"),
      lit(1234567.890123).cast("double").as("col_10"))
    val r = t.head()
    assert(r.getByte(0) === (-128).toByte && r.getShort(1) === 255.toShort)
    assert(r.getShort(2) === Short.MinValue && r.getInt(3) === 65535)
    assert(r.getInt(4) === Int.MinValue && r.getLong(5) === 4294967295L)
    assert(r.getLong(6) === Long.MinValue)
    assert(r.getDecimal(7).toString === "18446744073709551615")
    // Float32 renders 12345.679 (7 significant digits)
    assert(t.select($"col_9".cast("string")).head().getString(0) === "12345.679")
    assert(r.getDouble(9) === 1234567.890123)
    // every boundary value filters back to its own row
    assert(t.where($"col_1" === -128 && $"col_2" === 255 &&
      $"col_3" === -32768 && $"col_4" === 65535 &&
      $"col_5" === -2147483648 && $"col_6" === 4294967295L &&
      $"col_7" === Long.MinValue &&
      $"col_8" === lit("18446744073709551615").cast("decimal(20,0)") &&
      $"col_10" === 1234567.890123).count() === 1L)
  }
}
