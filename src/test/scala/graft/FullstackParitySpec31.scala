package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Thirty-first tranche: the clustered-index boundary-comparison suite
  * (`/root/reference/tests/fullstack-test2/clustered_index/query.test`):
  * the FULL {>, >=, <, <=, =} matrix at the type extremes of the three
  * clustered-handle shapes — signed BIGINT (±2^63), unsigned BIGINT
  * (0 / 2^63 / 2^64−1, carried as DECIMAL(20,0) per the type mapping),
  * and a composite (DECIMAL(6,2), BIGINT) key — each comparison checked
  * against a Scala-computed model of the row set. */
class FullstackParitySpec31 extends SparkTestBase {
  import spark.implicits._

  private def matrix[A: Ordering](df: DataFrame, colName: String,
      values: Seq[A], probes: Seq[A], get: org.apache.spark.sql.Row => A): Unit = {
    val ord = implicitly[Ordering[A]]
    for (p <- probes) {
      def run(c: org.apache.spark.sql.Column): Seq[A] =
        df.where(c).collect().toSeq.map(get).sorted
      def expect(f: A => Boolean): Seq[A] = values.filter(f).sorted
      val pc = df(colName)
      val lt = lit(p.toString)
      assert(run(pc > lt.cast(df.schema(colName).dataType)) ===
        expect(v => ord.gt(v, p)), s"$colName > $p")
      assert(run(pc >= lt.cast(df.schema(colName).dataType)) ===
        expect(v => ord.gteq(v, p)), s"$colName >= $p")
      assert(run(pc < lt.cast(df.schema(colName).dataType)) ===
        expect(v => ord.lt(v, p)), s"$colName < $p")
      assert(run(pc <= lt.cast(df.schema(colName).dataType)) ===
        expect(v => ord.lteq(v, p)), s"$colName <= $p")
      assert(run(pc === lt.cast(df.schema(colName).dataType)) ===
        expect(v => ord.equiv(v, p)), s"$colName = $p")
    }
  }

  test("query.test t_1: signed BIGINT handle at ±2^63") {
    val values = Seq(Long.MinValue, Long.MaxValue, 0L)
    val t = values.zip(Seq(1, 2, 3)).toDF("a", "col")
    matrix[Long](t, "a", values, Seq(Long.MinValue, Long.MaxValue, 0L),
      _.getLong(0))
    // verbatim: > min excludes only the min row
    assert(t.where($"a" > Long.MinValue).select($"col").collect()
      .map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
  }

  test("query.test t_2: unsigned BIGINT handle as DECIMAL(20,0) at 0 / 2^63 / 2^64-1") {
    val values = Seq(BigDecimal(0), BigDecimal("18446744073709551615"),
      BigDecimal("9223372036854775808"))
    val t = values.map(_.toString).zip(Seq(1, 2, 3)).toDF("s", "col")
      .select($"s".cast("decimal(20,0)").as("a"), $"col")
    matrix[BigDecimal](t, "a", values, values,
      r => BigDecimal(r.getDecimal(0)))
    // the full-range scan keeps unsigned order: 0 < 2^63 < 2^64-1
    assert(t.orderBy($"a").select($"col").collect().map(_.getInt(0)).toSeq
      === Seq(1, 3, 2))
  }

  test("query.test t_3: composite (DECIMAL(6,2), BIGINT) clustered key") {
    val rows = Seq(("-9999.99", Long.MinValue, 0), ("9999.99", Long.MaxValue, 1),
      ("12.21", 12L, 2))
    val t = rows.toDF("s", "b", "c")
      .select($"s".cast("decimal(6,2)").as("a"), $"b", $"c")
    val values = rows.map(r => BigDecimal(r._1))
    matrix[BigDecimal](t, "a", values, values, r => BigDecimal(r.getDecimal(0)))
    // verbatim rows for the <= 9999.99 sweep
    val got = t.where($"a" <= "9999.99").orderBy($"a")
      .collect().map(r => (r.getDecimal(0).toString, r.getLong(1), r.getInt(2))).toSeq
    assert(got === Seq(
      ("-9999.99", Long.MinValue, 0), ("12.21", 12L, 2),
      ("9999.99", Long.MaxValue, 1)))
    // composite-key point lookup: both components must match
    assert(t.where($"a" === "12.21" && $"b" === 12L).count() === 1L)
    assert(t.where($"a" === "12.21" && $"b" === 13L).count() === 0L)
    // range over the first component + tiebreak on the second
    assert(t.where($"a" >= "-9999.99" && $"b" > Long.MinValue)
      .count() === 2L)
  }
}
