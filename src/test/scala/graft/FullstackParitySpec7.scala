package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Seventh tranche of reference fullstack transcripts
  * (`/root/reference/tests/fullstack-test/expr/<name>.test`) mirrored
  * verbatim: ROUND's per-type rounding mode (half-even on approximate
  * types ≙ Spark `bround`, half-away-from-zero on exact decimals ≙
  * Spark `round`, identity on integers incl. unsigned-64 max), and
  * mixed-type IN lists (decimal vs int literals, out-of-range
  * literals, string coercion, NULL in the list → three-valued result
  * over aggregated truthiness). */
class FullstackParitySpec7 extends SparkTestBase {
  import spark.implicits._

  test("round.test: integers incl. uint64 max round to themselves") {
    // int8/int64/uint64 rows verbatim
    val i64 = Seq(Some(0L), Some(1L), Some(-1L),
      Some(9223372036854775807L), Some(-9223372036854775808L), None).toDF("a")
    assert(i64.select(round($"a").cast("string")).as[String].collect().toSeq ===
      Seq("0", "1", "-1", "9223372036854775807", "-9223372036854775808", null))
    val u64 = Seq("0", "1", "18446744073709551615").toDF("s")
      .select($"s".cast(DecimalType(20, 0)).as("a"))
    assert(u64.select(round($"a").cast("string")).as[String].collect().toSeq ===
      Seq("0", "1", "18446744073709551615"))
  }

  test("round.test: approximate types round HALF-EVEN (bround), incl. float promotion") {
    // float64 rows verbatim: ±x.5 go to the even neighbor
    val vals = Seq(-5.5, -4.5, -3.5, -2.5, -1.5, -0.6, -0.5, -0.4, 0.0,
      0.4, 0.5, 0.6, 1.5, 2.5, 3.5, 4.5, 5.5)
    val expect = Seq(-6.0, -4.0, -4.0, -2.0, -2.0, -1.0, -0.0, -0.0, 0.0,
      0.0, 0.0, 1.0, 2.0, 2.0, 4.0, 4.0, 6.0)
    val got = vals.toDF("a").select(bround($"a")).as[Double].collect().toSeq
    assert(got === expect, s"bround mismatch: $got")
    // 1e100 passes through; float32 1e30 promotes to its double repr
    assert(Seq(1e100).toDF("a").select(bround($"a")).head.getDouble(0) === 1e100)
    val f32 = Seq(1e30f).toDF("f").select($"f".cast("double").as("a"))
    assert(f32.select(bround($"a")).head.getDouble(0) === 1.0000000150474662e30)
  }

  test("round.test: exact decimals round HALF-AWAY-FROM-ZERO (round)") {
    // decimal32_2 (9,1) rows verbatim: ±x.5 move away from zero
    val d92 = Seq("-5.5", "-4.5", "-3.5", "-2.5", "-1.5", "-0.6", "-0.5",
      "-0.4", "0", "0.4", "0.5", "0.6", "1.5", "2.5", "3.5", "4.5", "5.5",
      "99999999.9", "-99999999.9")
      .toDF("s").select($"s".cast(DecimalType(9, 1)).as("a"))
    assert(d92.select(round($"a").cast("long")).as[Long].collect().toSeq ===
      Seq(-6L, -5L, -4L, -3L, -2L, -1L, -1L, 0L, 0L, 0L, 1L, 1L, 2L, 3L,
        4L, 5L, 6L, 100000000L, -100000000L))
    // decimal32_3 (9,9) + decimal128 (30,30) rows verbatim: sub-unit
    // magnitudes collapse to 0/±1
    val d99 = Seq("0", "-0.000000001", "0.000000001", "0.5", "-0.5",
      "0.999999999", "-0.999999999")
      .toDF("s").select($"s".cast(DecimalType(9, 9)).as("a"))
    assert(d99.select(round($"a").cast("long")).as[Long].collect().toSeq ===
      Seq(0L, 0L, 0L, 1L, -1L, 1L, -1L))
    val d30 = Seq("0", "-0.000000000000000000000000000001",
      "0.000000000000000000000000000001", "0.5", "-0.5",
      "0.999999999999999999999999999999", "-0.999999999999999999999999999999")
      .toDF("s").select($"s".cast(DecimalType(30, 30)).as("a"))
    assert(d30.select(round($"a").cast("long")).as[Long].collect().toSeq ===
      Seq(0L, 0L, 0L, 1L, -1L, 1L, -1L))
  }

  test("in_expression.test: mixed-type lists, out-of-range literals, string coercion") {
    // table rows verbatim
    val t = Seq((BigDecimal("1"), -80.toByte, -1, BigDecimal("1")),
      (BigDecimal("3"), -90.toByte, -3, BigDecimal("0")))
      .toDF("a", "b", "c", "d")
      .select($"a".cast(DecimalType(4, 2)).as("a"), $"b", $"c",
        $"d".cast(DecimalType(38, 20)).as("d"))
    // decimal IN (numeric literals of mixed type)
    assert(t.where($"a".isin(1.0, 2)).select($"a".cast("string"))
      .as[String].collect().toSeq === Seq("1.00"))
    // tinyint IN (out-of-range ints) → empty, no overflow wrap
    assert(t.where($"b".isin(-302764853, 12498864)).count() === 0)
    // int IN (1, 2^64): the unrepresentable literal compares as decimal
    assert(t.where($"c".cast(DecimalType(38, 0))
      .isin(BigDecimal(1), BigDecimal("18446744073709551616"))).count() === 0)
    // duplicate list values are fine
    assert(t.where($"d".isin(1, 1)).select($"a".cast("string"))
      .as[String].collect().toSeq === Seq("1.00"))
    // 'y' coerces to 0 under MySQL lax numeric coercion → matches d=0
    val yNum = coalesce(try_to_number(
      regexp_extract(lit("y"), "^[+-]?[0-9]+", 0), lit("S9999999")), lit(0))
    assert(t.where($"d".isin(lit(2), yNum)).select($"a".cast("string"))
      .as[String].collect().toSeq === Seq("3.00"))
  }

  test("in_expression.test: NULL in the IN list is three-valued over aggregated truthiness") {
    // 12 rows verbatim; a is unique → 12 single-row groups
    val rows = Seq((0, 0, Some(0)), (1, 0, Some(1)), (2, 0, None),
      (3, 1, Some(0)), (4, 1, Some(1)), (5, 1, None),
      (6, 0, Some(0)), (7, 0, Some(1)), (8, 0, None),
      (9, 1, Some(0)), (10, 1, Some(1)), (11, 1, None))
    val t = rows.toDF("a", "b", "c")
    // MySQL x OR k / x AND k truthiness lifted to nullable ints
    def orK(c: org.apache.spark.sql.Column, k: Boolean) =
      ((c =!= 0) || lit(k)).cast("int")
    def andK(c: org.apache.spark.sql.Column, k: Boolean) =
      ((c =!= 0) && lit(k)).cast("int")
    val g = t.groupBy($"a", $"b", $"c").agg(
        avg(orK($"a", true)).as("ao1"), avg(orK($"a", false)).as("ao0"),
        avg(orK($"b", false)).as("bo0"), avg(orK($"c", false)).as("co0"),
        avg(andK($"c", false)).as("ca0"))
      .select($"a", $"b", $"c",
        expr("ao1 IN (NULL, 0, 0)").as("x1"), expr("ao1 IN (NULL, 1, 1)").as("x2"),
        expr("ao0 IN (NULL, 0, 0)").as("x3"),
        expr("bo0 IN (0, 0)").as("x4"), expr("bo0 IN (1, 1)").as("x5"),
        expr("co0 IN (0, 0)").as("x6"), expr("co0 IN (1, 1)").as("x7"),
        expr("ca0 IN (NULL, 0, 0)").as("x8"), expr("ca0 IN (1, 1)").as("x9"))
      .collect().map { r =>
        def ob(i: Int) = if (r.isNullAt(i)) None else Some(r.getBoolean(i))
        r.getInt(0) -> ((r.getInt(1),
          (ob(3), ob(4), ob(5), ob(6), ob(7), ob(8), ob(9), ob(10), ob(11))))
      }.toMap
    val T = Some(true); val F = Some(false); val N = Option.empty[Boolean]
    rows.foreach { case (a, b, c) =>
      val (bGot, (x1, x2, x3, x4, x5, x6, x7, x8, x9)) = g(a)
      assert(bGot === b)
      // avg(x or 1) = 1 always → IN(NULL,0,0)=NULL, IN(NULL,1,1)=true
      assert((x1, x2) === (N, T), s"row $a or-1")
      // avg(a or 0): 0 → matches the 0s; nonzero → NULL (no match + NULL)
      assert(x3 === (if (a == 0) T else N), s"row $a or-0")
      // avg(b or 0) = b exactly
      assert((x4, x5) === (if (b == 0) (T, F) else (F, T)), s"row $a b")
      // avg(c or 0) = c, NULL stays NULL through avg and IN
      val cExp = c match {
        case Some(0) => (T, F); case Some(_) => (F, T); case None => (N, N)
      }
      assert((x6, x7) === cExp, s"row $a c")
      // x AND 0 = 0 even for NULL x → IN(NULL,0,0)=true, IN(1,1)=false
      assert((x8, x9) === (T, F), s"row $a and-0")
    }
  }
}
