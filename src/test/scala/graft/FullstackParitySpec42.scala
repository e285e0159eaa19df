package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat

/** Forty-second tranche — the remaining cast / dynamic-round /
  * collation / JSON-literal fixtures:
  *
  *  - `delta-merge-test/query/expr/cast_as_int.test`: the per-source
  *    `Cast*AsInt` matrix (int/real/decimal/string/datetime → int;
  *    datetime collapses to the yyyymmddhhmmss number).
  *  - `delta-merge-test/query/expr/cast_as_real.test`: every integer
  *    width signed+unsigned → double at its boundary value (UInt64's
  *    18446744073709551615 must survive via unsigned decimal, landing
  *    on the double 1.8446744073709552e19), Float32 widening keeps the
  *    float32 representation (-12345.6789f reads back
  *    -12345.6787109375), and NULLs propagate.
  *  - `fullstack-test/issues/issue_3333.test`: ROUND(float, b) where
  *    the scale b is a COLUMN of every MySQL integer width — the
  *    dynamic-scale rounding TiFlash dispatches at runtime and Spark's
  *    literal-only `round` cannot express (`mysql_round_real`).
  *  - `fullstack-test/issues/issue_6807.test`: utf8mb4_general_ci
  *    semi-join: `max(a) from t1 where a in (select b from t2 where
  *    a>b)` — both the IN membership and the > comparison and the MAX
  *    ordering are case-insensitive, but the RESULT carries original
  *    casing ('YmkS').
  *  - `fullstack-test/issues/issue_8482.test`: JSON literal coercion
  *    asymmetry — INSERT coerces `true` through the integer literal 1
  *    (the column holds json number 1), while the comparison operand
  *    `true` becomes json boolean; so `b = true` is 0 but `b = 1` is 1.
  */
class FullstackParitySpec42 extends SparkTestBase {
  import spark.implicits._

  test("cast_as_int.test: int/real/decimal/string/datetime -> int matrix") {
    val t = Seq((1, 1.234f, new java.math.BigDecimal("1.234"), "123",
      java.sql.Timestamp.valueOf("2020-09-15 01:00:00")))
      .toDF("a", "b", "c", "d", "e")
    val got = t.select(count(lit(1)).as("cnt"),
      first(col("a").cast("long")).as("ii"),
      first(round(col("b")).cast("long")).as("ri"), // MySQL real->int rounds
      first(round(col("c")).cast("long")).as("di"),
      first(MySqlCompat.mysql_cast_signed(col("d"))).as("si"),
      first(date_format(col("e"), "yyyyMMddHHmmss").cast("long")).as("ti"))
      .head()
    assert(got.getLong(0) === 1L)
    assert(got.getLong(1) === 1L, "cast_int_int(1)")
    assert(got.getLong(2) === 1L, "cast_real_int(1.234) rounds to 1")
    assert(got.getLong(3) === 1L, "cast_decimal_int(1.234) rounds to 1")
    assert(got.getLong(4) === 123L, "cast_string_int('123')")
    assert(got.getLong(5) === 20200915010000L,
      "cast_time_int collapses to yyyymmddhhmmss")
  }

  test("cast_as_real.test: all integer widths + unsigned boundaries + float32 widening -> double") {
    // col_8 (UInt64 max) can't ride a Scala Long — carry it as the
    // unsigned reinterpretation of -1L through mysql_cast_unsigned's
    // decimal path, exactly how the engine stores TiDB's UInt64.
    val F = null.asInstanceOf[java.lang.Float]
    val rows = Seq(
      (-128, 255, -32768, null.asInstanceOf[java.lang.Integer], -2147483648,
        4294967295L, Long.MinValue, -1L, F, 1234567.890123),
      (-128, 255, -32768, Int.box(65535), -2147483648,
        4294967295L, Long.MinValue, -1L, Float.box(-12345.6789f), 1234567.890123),
      (-128, 255, -32768, Int.box(65535), -2147483648,
        4294967295L, Long.MinValue, -1L, F, 1234567.890123),
      (-128, 255, -32768, null.asInstanceOf[java.lang.Integer], -2147483648,
        4294967295L, Long.MinValue, -1L, Float.box(12345.6789f), 1234567.890123))
      .toDF("c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8", "c9", "c10")
    // numeric->real is plain IEEE widening (CastIntAsReal /
    // CastRealAsReal); only UInt64 needs the unsigned-decimal bridge
    val got = rows.select(
      col("c1").cast("double").as("r1"), col("c2").cast("double").as("r2"),
      col("c3").cast("double").as("r3"), col("c4").cast("double").as("r4"),
      col("c5").cast("double").as("r5"), col("c6").cast("double").as("r6"),
      col("c7").cast("double").as("r7"),
      MySqlCompat.mysql_cast_unsigned(col("c8")).cast("double").as("r8"),
      col("c9").cast("double").as("r9"), col("c10").as("r10"))
      .collect().sortBy(r => (r.isNullAt(3), r.isNullAt(8)))
    assert(got.length === 4)
    got.foreach { r =>
      assert(r.getDouble(0) === -128.0 && r.getDouble(1) === 255.0)
      assert(r.getDouble(2) === -32768.0)
      assert(r.getDouble(4) === -2147483648.0 && r.getDouble(5) === 4294967295.0)
      assert(r.getDouble(6) === -9.223372036854776e18,
        "Int64 min -> nearest double (prints -9223372036854776000)")
      assert(r.getDouble(7) === 1.8446744073709552e19,
        "UInt64 max -> nearest double (prints 18446744073709552000)")
      assert(r.getDouble(9) === 1234567.890123)
    }
    val f32 = got.filter(!_.isNullAt(8)).map(_.getDouble(8)).sorted
    assert(f32.toSeq === Seq(-12345.6787109375, 12345.6787109375),
      "float32 widens to its exact binary32 value")
    assert(got.count(_.isNullAt(8)) === 2 && got.count(_.isNullAt(3)) === 2)
  }

  test("issue_3333.test: ROUND(float, b) with the scale from every integer column width") {
    // eight tables t0..t7 with b tinyint..bigint signed/unsigned all
    // collapse to the same shape: a = 1.22f, b = 2 -> 1.22
    val widths = Seq[(String, Column)](
      ("bigint", lit(2L)), ("bigint unsigned", lit(2L)),
      ("int", lit(2)), ("int unsigned", lit(2L)),
      ("smallint", lit(2.toShort).cast("int")), ("smallint unsigned", lit(2)),
      ("tinyint", lit(2.toByte).cast("int")), ("tinyint unsigned", lit(2)))
    val t = Seq(1.22f).toDF("a")
    widths.foreach { case (w, b) =>
      val r = t.select(MySqlCompat.mysql_round_real(col("a"), b).as("r")).head()
      assert(r.getDouble(0) === 1.22, s"round(a, b $w) must be 1.22")
    }
    // and the dynamic ladder really is per-row: one frame, three scales
    val multi = Seq((1.2345f, 0), (1.2345f, 1), (1.2345f, 3)).toDF("a", "b")
      .select(MySqlCompat.mysql_round_real(col("a"), col("b")).as("r"))
      .collect().map(_.getDouble(0)).sorted
    assert(multi.toSeq === Seq(1.0, 1.2, 1.235))
  }

  test("issue_6807.test: general_ci semi-join IN + ci MAX keeps original casing") {
    val t1 = Seq(("jlsf", 1), (null, 2), ("YmkS", 3), ("0", 4)).toDF("a", "id")
    val t2 = Seq(("yMKs", "jlsf", 1), ("yyds", "YmkS", 2), ("cc", "4", 3),
      (null, null, 4), ("abc", null, 5), (null, "df", 6)).toDF("a", "b", "id")
    // ci comparisons via lower() normalization (the q55/q59 discipline)
    val inSet = t2.filter(lower(col("a")) > lower(col("b")))
      .select(lower(col("b")).as("bk")).distinct()
    val got = t1.join(inSet, lower(col("a")) === col("bk"), "left_semi")
      .agg(max_by(col("a"), lower(col("a"))).as("m")).head()
    assert(got.getString(0) === "YmkS",
      "max under ci ordering returns the original-cased winner")
  }

  test("issue_8482.test: JSON insert coerces true->1 but comparison keeps boolean") {
    // INSERT ... VALUES (true) into a json column stores json number 1
    // (the boolean literal folds to the integer literal first); a
    // comparison operand `true` lifts to json boolean. Canonical-text
    // JSON equality (the MySqlJsonPath discipline) pins the asymmetry.
    val t = Seq("1").toDF("b") // column value after insert coercion
    val eqTrue = t.select((col("b") === lit("true")).cast("int").as("e")).head()
    val eqOne = t.select((col("b") === lit("1")).cast("int").as("e")).head()
    assert(eqTrue.getInt(0) === 0, "b = true is 0: json 1 != json true")
    assert(eqOne.getInt(0) === 1, "b = 1 is 1: json 1 == json 1")
  }
}
