package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Eighth tranche: `expr/mod_extra.test` (the generated cross-type MOD
  * matrix) mirrored on its distinctive rows — sign follows the
  * dividend, MIN_LONG edge cases, an unsigned-64 divisor larger than
  * |MIN_LONG|, fmod on doubles incl. a near-subnormal divisor, and
  * exact decimal remainders at the int64 boundary. Zero/NULL divisors
  * (MySQL: NULL) are covered by the existing `mysql_mod` mirrors of
  * mod.test; this file pins the VALUE semantics. */
class FullstackParitySpec8 extends SparkTestBase {
  import spark.implicits._

  private val MAX = 9223372036854775807L
  private val MIN = -9223372036854775808L
  // i64 rows verbatim: id → value (id1=0 dividend, divisors skip 0/null)
  private val i64 = Seq(1 -> 0L, 2 -> 5L, 3 -> -5L, 4 -> 3L, 5 -> -3L,
    6 -> MAX, 7 -> MIN)

  test("mod_extra.test: i64 % i64 — sign of dividend, MIN/MAX edges") {
    val t = i64.toDF("id_a", "a").crossJoin(
      i64.filter(_._1 >= 2).toDF("id_b", "b"))
    val got = t.select($"id_a", $"id_b", ($"a" % $"b").as("v"))
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // expected table verbatim (44 rows); spot the full id 6/7 rows +
    // the sign pattern
    assert(got((2, 4)) === 2L && got((2, 6)) === 5L && got((2, 7)) === 5L)
    assert(got((3, 4)) === -2L && got((3, 6)) === -5L && got((3, 7)) === -5L)
    assert(got((4, 2)) === 3L && got((4, 4)) === 0L && got((4, 6)) === 3L)
    assert(got((5, 2)) === -3L && got((5, 6)) === -3L)
    assert(got((6, 2)) === 2L && got((6, 4)) === 1L && got((6, 6)) === 0L)
    assert(got((6, 7)) === MAX, "MAX % MIN = MAX")
    assert(got((7, 2)) === -3L && got((7, 4)) === -2L && got((7, 6)) === -1L)
    assert(got((7, 7)) === 0L, "MIN % MIN = 0")
    assert(i64.filter(_._1 >= 2).forall { case (idb, _) => got((1, idb)) === 0L })
  }

  test("mod_extra.test: i64 % u64 — divisor above |MIN_LONG| returns the dividend") {
    // u64 divisors verbatim: 5, 3, 18446744073709551615 (ids 9-11)
    val u = Seq(9 -> "5", 10 -> "3", 11 -> "18446744073709551615")
    val t = i64.toDF("id_a", "a").crossJoin(u.toDF("id_b", "bs"))
      .select($"id_a", $"id_b", $"a",
        $"bs".cast(DecimalType(20, 0)).as("b"))
    val got = t.select($"id_a", $"id_b",
        ($"a".cast(DecimalType(20, 0)) % $"b").cast("long").as("v"))
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // expected rows verbatim
    assert(got((2, 9)) === 0L && got((2, 10)) === 2L && got((2, 11)) === 5L)
    assert(got((3, 11)) === -5L && got((4, 11)) === 3L && got((5, 11)) === -3L)
    assert(got((6, 11)) === MAX, "MAX % u64max = MAX")
    assert(got((7, 11)) === MIN, "MIN % u64max = MIN (divisor exceeds |MIN|)")
    assert(got((6, 9)) === 2L && got((6, 10)) === 1L)
    assert(got((7, 9)) === -3L && got((7, 10)) === -2L)
  }

  test("mod_extra.test: i64 % f64 — C fmod semantics incl. 3e-308 divisor") {
    // f64 divisors verbatim: 1.1, -1.1, 1.3, -1.3, 1e100, 3e-308
    val f = Seq(13 -> 1.1, 14 -> -1.1, 15 -> 1.3, 16 -> -1.3,
      18 -> 1e100, 19 -> 3e-308)
    val t = i64.toDF("id_a", "a").crossJoin(f.toDF("id_b", "b"))
    val got = t.select($"id_a", $"id_b", ($"a".cast("double") % $"b").as("v"))
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // expected rows verbatim (fmod keeps the dividend's sign; the
    // transcript's id 17/18 divisor columns are 1e100 / 3e-308 here)
    assert(got((2, 13)) === 0.5999999999999996 && got((2, 15)) === 1.0999999999999999)
    assert(got((3, 13)) === -0.5999999999999996 && got((3, 16)) === -1.0999999999999999)
    assert(got((4, 13)) === 0.7999999999999998 && got((4, 15)) === 0.3999999999999999)
    assert(got((2, 18)) === 5.0, "5 % 1e100 = 5")
    assert(got((2, 19)) === 2.1284678556589843e-308)
    assert(got((3, 19)) === -2.1284678556589843e-308)
    assert(got((4, 19)) === 1.2770807133953906e-308)
  }

  test("mod_extra.test: i64 % decimal — exact remainders at the int64 boundary") {
    // d18 divisors verbatim: 1.1, 1.3, 999999999999.999999 (and mirrors)
    val dvs = Seq(20 -> "1.1", 22 -> "1.3", 24 -> "999999999999.999999")
    val t = i64.toDF("id_a", "a").crossJoin(dvs.toDF("id_b", "ds"))
      .select($"id_a", $"id_b", $"a", $"ds".cast(DecimalType(18, 6)).as("d"))
    val got = t.select($"id_a", $"id_b",
        ($"a".cast(DecimalType(25, 6)) % $"d").cast("string").as("v"))
      .as[(Int, Int, String)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // expected rows verbatim
    assert(got((2, 20)) === "0.600000" && got((2, 22)) === "1.100000")
    assert(got((3, 20)) === "-0.600000" && got((3, 22)) === "-1.100000")
    assert(got((4, 20)) === "0.800000" && got((4, 22)) === "0.400000")
    assert(got((6, 24)) === "36854775816.223372")
    assert(got((7, 24)) === "-36854775817.223372")
    assert(got((1, 24)) === "0.000000")
  }
}
