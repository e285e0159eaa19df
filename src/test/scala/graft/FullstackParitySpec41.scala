package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-first tranche — `mpp/window_agg.test` mirrored: aggregate
  * window functions (sum/count/min/max) under the fixture's frame
  * matrix — ROWS frames whose bounds are both preceding / both
  * following, RANGE frames with numeric offsets over a table whose
  * PARTITION keys and ORDER keys are NULL-riddled (the MySQL "null
  * peer group" semantics: all null-ordered rows are peers and any
  * offset RANGE frame over a null current row is exactly that group),
  * the implicit ANSI default frame (RANGE UNBOUNDED PRECEDING →
  * CURRENT ROW including peers), and min/max over int/varchar/date
  * columns in one ROWS frame (the reference's min_max_improve_t).
  * Golden outputs transcribed verbatim from
  * `/root/reference/tests/fullstack-test/mpp/window_agg.test`.
  */
class FullstackParitySpec41 extends SparkTestBase {
  import spark.implicits._

  private val t1 = Seq(
    (0, 0, -1), (1, 0, -1), (1, 1, 0), (1, 3, 4), (1, 6, 6), (1, 7, -5),
    (1, 8, 3), (1, 18, 1), (1, 30, 30), (2, 0, 2), (2, 1, 0), (2, 4, -4),
    (2, 7, -2), (2, 8, 1), (2, 15, 2), (2, 30, -11), (3, 0, 7), (3, 4, -3),
    (3, 6, 9), (3, 10, -9), (3, 20, -3), (3, 40, 2), (3, 41, 1), (4, 0, 4),
    (5, 0, -5), (6, 0, 2), (6, 10, 5), (6, 30, 0), (7, 0, 3), (7, 1, 3),
    (7, 2, 2), (7, 3, -4), (7, 4, 9)).toDF("p", "o", "v")

  private val I = null.asInstanceOf[java.lang.Integer]
  private def i(x: Int): java.lang.Integer = Int.box(x)
  private val t5 = Seq[(java.lang.Integer, java.lang.Integer, java.lang.Integer)](
    (I, I, i(3)), (I, I, i(5)), (I, i(1), I), (I, i(1), i(2)), (I, i(2), i(5)),
    (I, i(3), I), (I, i(3), i(2)), (i(0), I, i(1)), (i(1), i(0), i(4)),
    (i(1), i(1), i(3)), (i(1), i(2), i(22)), (i(1), i(2), i(6)), (i(1), i(2), I),
    (i(1), i(2), i(54)), (i(1), i(2), i(3)), (i(1), i(6), i(6)), (i(1), i(6), I),
    (i(1), i(10), I), (i(1), i(11), i(5)), (i(1), i(13), I), (i(1), i(13), i(12)),
    (i(1), i(13), i(3)), (i(1), i(13), i(53)), (i(1), i(16), i(2)),
    (i(1), i(20), i(6)), (i(1), I, i(4)), (i(1), I, I), (i(1), I, i(9)),
    (i(1), I, i(3)), (i(1), I, i(6)), (i(2), i(0), i(4)), (i(3), i(0), i(2)),
    (i(4), i(0), i(6)), (i(4), i(1), i(7)), (i(4), i(1), i(4)), (i(4), i(1), i(3)),
    (i(4), i(2), i(4)), (i(4), i(3), i(6)), (i(4), i(3), i(4)), (i(4), i(4), I),
    (i(4), i(4), i(2)), (i(4), i(4), i(7)), (i(4), I, i(1)), (i(4), I, i(8)),
    (i(5), i(0), i(2)), (i(5), i(0), i(6)), (i(6), I, i(2)), (i(6), i(0), i(8)),
    (i(6), i(1), i(6)), (i(6), i(2), i(5)), (i(6), i(3), i(4)), (i(6), i(3), i(3)),
    (i(6), i(3), i(2)), (i(6), i(0), i(4)), (i(6), i(0), i(5)))
    .toDF("p", "o", "v")

  /** canonical (p, o, v, sum, count, min, max) row string, NULL-safe */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(r => (0 until r.length).map(j =>
      if (r.isNullAt(j)) "N" else r.get(j).toString).mkString(",")).toSeq.sorted

  private def expectStr(rows: Seq[(Any, Any, Any, Any, Any, Any, Any)]): Seq[String] =
    rows.map(t => t.productIterator.map {
      case null => "N"
      case x => x.toString
    }.mkString(",")).sorted

  private def winAgg(df: org.apache.spark.sql.DataFrame,
      w: org.apache.spark.sql.expressions.WindowSpec) =
    df.select(col("p"), col("o"), col("v"),
      sum(col("v")).over(w).as("sum"), count(col("v")).over(w).as("count"),
      min(col("v")).over(w).as("min"), max(col("v")).over(w).as("max"))

  test("window_agg.test: ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING (both-bounds-preceding frame)") {
    val w = Window.partitionBy("p").orderBy("o").rowsBetween(-3, -1)
    val got = canon(winAgg(t1, w))
    val exp = expectStr(Seq[(Any, Any, Any, Any, Any, Any, Any)](
      (4, 0, 4, null, 0, null, null), (0, 0, -1, null, 0, null, null),
      (5, 0, -5, null, 0, null, null), (2, 0, 2, null, 0, null, null),
      (2, 1, 0, 2, 1, 2, 2), (2, 4, -4, 2, 2, 0, 2), (2, 7, -2, -2, 3, -4, 2),
      (2, 8, 1, -6, 3, -4, 0), (2, 15, 2, -5, 3, -4, 1),
      (2, 30, -11, 1, 3, -2, 2), (1, 0, -1, null, 0, null, null),
      (1, 1, 0, -1, 1, -1, -1), (1, 3, 4, -1, 2, -1, 0), (1, 6, 6, 3, 3, -1, 4),
      (1, 7, -5, 10, 3, 0, 6), (1, 8, 3, 5, 3, -5, 6), (1, 18, 1, 4, 3, -5, 6),
      (1, 30, 30, -1, 3, -5, 3), (3, 0, 7, null, 0, null, null),
      (3, 4, -3, 7, 1, 7, 7), (3, 6, 9, 4, 2, -3, 7), (3, 10, -9, 13, 3, -3, 9),
      (3, 20, -3, -3, 3, -9, 9), (3, 40, 2, -3, 3, -9, 9),
      (3, 41, 1, -10, 3, -9, 2), (6, 0, 2, null, 0, null, null),
      (6, 10, 5, 2, 1, 2, 2), (6, 30, 0, 7, 2, 2, 5),
      (7, 0, 3, null, 0, null, null), (7, 1, 3, 3, 1, 3, 3),
      (7, 2, 2, 6, 2, 3, 3), (7, 3, -4, 8, 3, 2, 3), (7, 4, 9, 1, 3, -4, 3)))
    assert(got === exp)
  }

  test("window_agg.test: ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING (both-bounds-following frame)") {
    val w = Window.partitionBy("p").orderBy("o").rowsBetween(1, 3)
    val got = canon(winAgg(t1, w))
    val exp = expectStr(Seq[(Any, Any, Any, Any, Any, Any, Any)](
      (4, 0, 4, null, 0, null, null), (2, 0, 2, -6, 3, -4, 0),
      (2, 1, 0, -5, 3, -4, 1), (2, 4, -4, 1, 3, -2, 2), (2, 7, -2, -8, 3, -11, 2),
      (2, 8, 1, -9, 2, -11, 2), (2, 15, 2, -11, 1, -11, -11),
      (2, 30, -11, null, 0, null, null), (0, 0, -1, null, 0, null, null),
      (5, 0, -5, null, 0, null, null), (3, 0, 7, -3, 3, -9, 9),
      (3, 4, -3, -3, 3, -9, 9), (3, 6, 9, -10, 3, -9, 2), (3, 10, -9, 0, 3, -3, 2),
      (3, 20, -3, 3, 2, 1, 2), (3, 40, 2, 1, 1, 1, 1),
      (3, 41, 1, null, 0, null, null), (1, 0, -1, 10, 3, 0, 6),
      (1, 1, 0, 5, 3, -5, 6), (1, 3, 4, 4, 3, -5, 6), (1, 6, 6, -1, 3, -5, 3),
      (1, 7, -5, 34, 3, 1, 30), (1, 8, 3, 31, 2, 1, 30), (1, 18, 1, 30, 1, 30, 30),
      (1, 30, 30, null, 0, null, null), (6, 0, 2, 5, 2, 0, 5),
      (6, 10, 5, 0, 1, 0, 0), (6, 30, 0, null, 0, null, null),
      (7, 0, 3, 1, 3, -4, 3), (7, 1, 3, 7, 3, -4, 9), (7, 2, 2, 5, 2, -4, 9),
      (7, 3, -4, 9, 1, 9, 9), (7, 4, 9, null, 0, null, null)))
    assert(got === exp)
  }

  test("window_agg.test t5: RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING over NULL partition/order keys") {
    val w = Window.partitionBy("p").orderBy("o").rangeBetween(-2, 2)
    val got = canon(winAgg(t5, w))
    val exp = expectStr(Seq[(Any, Any, Any, Any, Any, Any, Any)](
      (null, null, 3, 8, 2, 3, 5), (null, null, 5, 8, 2, 3, 5),
      (null, 1, null, 9, 3, 2, 5), (null, 1, 2, 9, 3, 2, 5),
      (null, 2, 5, 9, 3, 2, 5), (null, 3, null, 9, 3, 2, 5),
      (null, 3, 2, 9, 3, 2, 5), (0, null, 1, 1, 1, 1, 1),
      (1, null, null, 22, 4, 3, 9), (1, null, 3, 22, 4, 3, 9),
      (1, null, 4, 22, 4, 3, 9), (1, null, 6, 22, 4, 3, 9),
      (1, null, 9, 22, 4, 3, 9), (1, 0, 4, 92, 6, 3, 54),
      (1, 1, 3, 92, 6, 3, 54), (1, 2, null, 92, 6, 3, 54),
      (1, 2, 3, 92, 6, 3, 54), (1, 2, 6, 92, 6, 3, 54),
      (1, 2, 22, 92, 6, 3, 54), (1, 2, 54, 92, 6, 3, 54),
      (1, 6, null, 6, 1, 6, 6), (1, 6, 6, 6, 1, 6, 6),
      (1, 10, null, 5, 1, 5, 5), (1, 11, 5, 73, 4, 3, 53),
      (1, 13, null, 73, 4, 3, 53), (1, 13, 3, 73, 4, 3, 53),
      (1, 13, 12, 73, 4, 3, 53), (1, 13, 53, 73, 4, 3, 53),
      (1, 16, 2, 2, 1, 2, 2), (1, 20, 6, 6, 1, 6, 6), (2, 0, 4, 4, 1, 4, 4),
      (3, 0, 2, 2, 1, 2, 2), (4, null, 1, 9, 2, 1, 8), (4, null, 8, 9, 2, 1, 8),
      (4, 0, 6, 24, 5, 3, 7), (4, 1, 3, 34, 7, 3, 7), (4, 1, 4, 34, 7, 3, 7),
      (4, 1, 7, 34, 7, 3, 7), (4, 2, 4, 43, 9, 2, 7), (4, 3, 4, 37, 8, 2, 7),
      (4, 3, 6, 37, 8, 2, 7), (4, 4, null, 23, 5, 2, 7), (4, 4, 2, 23, 5, 2, 7),
      (4, 4, 7, 23, 5, 2, 7), (5, 0, 2, 8, 2, 2, 6), (5, 0, 6, 8, 2, 2, 6),
      (6, null, 2, 2, 1, 2, 2), (6, 0, 4, 28, 5, 4, 8), (6, 0, 5, 28, 5, 4, 8),
      (6, 0, 8, 28, 5, 4, 8), (6, 1, 6, 37, 8, 2, 8), (6, 2, 5, 37, 8, 2, 8),
      (6, 3, 2, 20, 5, 2, 6), (6, 3, 3, 20, 5, 2, 6), (6, 3, 4, 20, 5, 2, 6)))
    assert(got === exp)
  }

  test("window_agg.test t5: RANGE BETWEEN 3 PRECEDING AND 2 PRECEDING (empty frames; null group intact)") {
    val w = Window.partitionBy("p").orderBy("o").rangeBetween(-3, -2)
    val got = canon(winAgg(t5, w))
    val exp = expectStr(Seq[(Any, Any, Any, Any, Any, Any, Any)](
      (null, null, 3, 8, 2, 3, 5), (null, null, 5, 8, 2, 3, 5),
      (null, 1, null, null, 0, null, null), (null, 1, 2, null, 0, null, null),
      (null, 2, 5, null, 0, null, null), (null, 3, null, 2, 1, 2, 2),
      (null, 3, 2, 2, 1, 2, 2), (0, null, 1, 1, 1, 1, 1),
      (1, null, null, 22, 4, 3, 9), (1, null, 3, 22, 4, 3, 9),
      (1, null, 4, 22, 4, 3, 9), (1, null, 6, 22, 4, 3, 9),
      (1, null, 9, 22, 4, 3, 9), (1, 0, 4, null, 0, null, null),
      (1, 1, 3, null, 0, null, null), (1, 2, null, 4, 1, 4, 4),
      (1, 2, 3, 4, 1, 4, 4), (1, 2, 6, 4, 1, 4, 4), (1, 2, 22, 4, 1, 4, 4),
      (1, 2, 54, 4, 1, 4, 4), (1, 6, null, null, 0, null, null),
      (1, 6, 6, null, 0, null, null), (1, 10, null, null, 0, null, null),
      (1, 11, 5, null, 0, null, null), (1, 13, null, 5, 1, 5, 5),
      (1, 13, 3, 5, 1, 5, 5), (1, 13, 12, 5, 1, 5, 5), (1, 13, 53, 5, 1, 5, 5),
      (1, 16, 2, 68, 3, 3, 53), (1, 20, 6, null, 0, null, null),
      (2, 0, 4, null, 0, null, null), (3, 0, 2, null, 0, null, null),
      (4, null, 1, 9, 2, 1, 8), (4, null, 8, 9, 2, 1, 8),
      (4, 0, 6, null, 0, null, null), (4, 1, 3, null, 0, null, null),
      (4, 1, 4, null, 0, null, null), (4, 1, 7, null, 0, null, null),
      (4, 2, 4, 6, 1, 6, 6), (4, 3, 4, 20, 4, 3, 7), (4, 3, 6, 20, 4, 3, 7),
      (4, 4, null, 18, 4, 3, 7), (4, 4, 2, 18, 4, 3, 7), (4, 4, 7, 18, 4, 3, 7),
      (5, 0, 2, null, 0, null, null), (5, 0, 6, null, 0, null, null),
      (6, null, 2, 2, 1, 2, 2), (6, 0, 4, null, 0, null, null),
      (6, 0, 5, null, 0, null, null), (6, 0, 8, null, 0, null, null),
      (6, 1, 6, null, 0, null, null), (6, 2, 5, 17, 3, 4, 8),
      (6, 3, 2, 23, 4, 4, 8), (6, 3, 3, 23, 4, 4, 8), (6, 3, 4, 23, 4, 4, 8)))
    assert(got === exp)
  }

  test("window_agg.test t5: implicit default frame (RANGE UNBOUNDED PRECEDING → CURRENT ROW incl. peers)") {
    val w = Window.partitionBy("p").orderBy("o")
    val got = canon(winAgg(t5, w))
    val exp = expectStr(Seq[(Any, Any, Any, Any, Any, Any, Any)](
      (null, null, 3, 8, 2, 3, 5), (null, null, 5, 8, 2, 3, 5),
      (null, 1, null, 10, 3, 2, 5), (null, 1, 2, 10, 3, 2, 5),
      (null, 2, 5, 15, 4, 2, 5), (null, 3, null, 17, 5, 2, 5),
      (null, 3, 2, 17, 5, 2, 5), (0, null, 1, 1, 1, 1, 1),
      (1, null, 9, 22, 4, 3, 9), (1, null, 4, 22, 4, 3, 9),
      (1, null, null, 22, 4, 3, 9), (1, null, 3, 22, 4, 3, 9),
      (1, null, 6, 22, 4, 3, 9), (1, 0, 4, 26, 5, 3, 9),
      (1, 1, 3, 29, 6, 3, 9), (1, 2, 22, 114, 10, 3, 54),
      (1, 2, 6, 114, 10, 3, 54), (1, 2, null, 114, 10, 3, 54),
      (1, 2, 54, 114, 10, 3, 54), (1, 2, 3, 114, 10, 3, 54),
      (1, 6, 6, 120, 11, 3, 54), (1, 6, null, 120, 11, 3, 54),
      (1, 10, null, 120, 11, 3, 54), (1, 11, 5, 125, 12, 3, 54),
      (1, 13, null, 193, 15, 3, 54), (1, 13, 12, 193, 15, 3, 54),
      (1, 13, 3, 193, 15, 3, 54), (1, 13, 53, 193, 15, 3, 54),
      (1, 16, 2, 195, 16, 2, 54), (1, 20, 6, 201, 17, 2, 54),
      (2, 0, 4, 4, 1, 4, 4), (3, 0, 2, 2, 1, 2, 2),
      (4, null, 8, 9, 2, 1, 8), (4, null, 1, 9, 2, 1, 8),
      (4, 0, 6, 15, 3, 1, 8), (4, 1, 3, 29, 6, 1, 8), (4, 1, 7, 29, 6, 1, 8),
      (4, 1, 4, 29, 6, 1, 8), (4, 2, 4, 33, 7, 1, 8), (4, 3, 6, 43, 9, 1, 8),
      (4, 3, 4, 43, 9, 1, 8), (4, 4, null, 52, 11, 1, 8), (4, 4, 2, 52, 11, 1, 8),
      (4, 4, 7, 52, 11, 1, 8), (5, 0, 2, 8, 2, 2, 6), (5, 0, 6, 8, 2, 2, 6),
      (6, null, 2, 2, 1, 2, 2), (6, 0, 8, 19, 4, 2, 8), (6, 0, 4, 19, 4, 2, 8),
      (6, 0, 5, 19, 4, 2, 8), (6, 1, 6, 25, 5, 2, 8), (6, 2, 5, 30, 6, 2, 8),
      (6, 3, 4, 39, 9, 2, 8), (6, 3, 3, 39, 9, 2, 8), (6, 3, 2, 39, 9, 2, 8)))
    assert(got === exp)
  }

  test("window_agg.test min_max_improve_t: min/max over int, varchar (binary order), date in one ROWS frame") {
    // Fixture orders by p (constant) — TiFlash returns insertion
    // order, which equals o ascending; ordering by o reproduces the
    // exact frames deterministically.
    val t = Seq(
      (1, 0, 5, "", "2025-03-06"), (1, 1, -3, "67", "2025-03-01"),
      (1, 2, 5, "12345", "2025-03-01"), (1, 3, 1, "32", "2025-03-03"),
      (1, 4, -3, "", "2025-03-01"), (1, 5, 5, "65", "2025-03-06"),
      (1, 6, 2, "12345", "2025-03-04"), (1, 7, 0, "34", "2025-03-02"),
      (1, 8, 3, "", "2025-03-06"), (1, 9, -3, "12345", "2025-03-05"))
      .toDF("p", "o", "vi", "vs", "vds")
      .withColumn("vd", to_date(col("vds")))
    val w = Window.partitionBy("p").orderBy("o").rowsBetween(-3, 3)
    val got = t.select(col("o"), min(col("vi")).over(w), max(col("vi")).over(w),
        min(col("vs")).over(w), max(col("vs")).over(w),
        min(col("vd")).over(w).cast("string"), max(col("vd")).over(w).cast("string"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getString(4), r.getString(5), r.getString(6)))
      .sortBy(_._1)
    val exp = Seq(
      (0, -3, 5, "", "67", "2025-03-01", "2025-03-06"),
      (1, -3, 5, "", "67", "2025-03-01", "2025-03-06"),
      (2, -3, 5, "", "67", "2025-03-01", "2025-03-06"),
      (3, -3, 5, "", "67", "2025-03-01", "2025-03-06"),
      (4, -3, 5, "", "67", "2025-03-01", "2025-03-06"),
      (5, -3, 5, "", "65", "2025-03-01", "2025-03-06"),
      (6, -3, 5, "", "65", "2025-03-01", "2025-03-06"),
      (7, -3, 5, "", "65", "2025-03-01", "2025-03-06"),
      (8, -3, 5, "", "65", "2025-03-02", "2025-03-06"),
      (9, -3, 3, "", "34", "2025-03-02", "2025-03-06"))
    assert(got.toSeq === exp)
  }
}
