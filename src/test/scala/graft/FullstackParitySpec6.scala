package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sixth tranche of reference fullstack transcripts
  * (`/root/reference/tests/fullstack-test/expr/<name>.test`) mirrored
  * verbatim: MySQL decimal-division result scale (scale(a) +
  * div_precision_increment=4, HALF_UP) with WHERE truthiness over the
  * quotient, unary minus across signed/unsigned/double/decimal,
  * three-valued logical operators, NULL-literal propagation through
  * every expression family, first_row grouped-aggregate semantics
  * (incl. the empty-input → zero-rows rule), concat NULL propagation
  * with int coercion, Unicode case mapping, and lax string→decimal. */
class FullstackParitySpec6 extends SparkTestBase {
  import spark.implicits._

  /** MySQL a/b: result scale = scale(a) + 4, rounded HALF_UP. The
    * (38,19)/(19,0) operand shapes force Spark's internal quotient
    * scale to 19, so the single HALF_UP cast to scale 4 matches
    * MySQL's one-step rounding (a lower internal scale would
    * double-round 1/20001 to 0.0001). */
  private def mysqlDiv4(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    (a.cast(DecimalType(38, 19)) / b.cast(DecimalType(19, 0)))
      .cast(DecimalType(38, 4))

  test("decimal_divide.test: scale(a)+4 HALF_UP quotients, all operand type pairs") {
    // expr/decimal_divide.test blocks 1-4 verbatim: decimal/decimal,
    // int/decimal, decimal/int, int/int all give 1/b at scale 0+4
    val t = Seq(10000L, 10001L, 20000L, 20001L).toDF("b")
    val got = t.select($"b", mysqlDiv4(lit(1), $"b").cast("string").as("q"))
      .orderBy($"b").as[(Long, String)].collect().toSeq
    assert(got === Seq(10000L -> "0.0001", 10001L -> "0.0001",
      20000L -> "0.0001", 20001L -> "0.0000"))
  }

  test("decimal_divide.test: WHERE a/b truthiness drops quotients that round to zero") {
    // block 5 verbatim: int32-boundary pairs — WHERE a/b keeps all 20
    val quads = for {
      a <- Seq(2147483647L, -2147483647L)
      b <- Seq(1L, 1073741823L, 1073741824L, 2147483646L, 2147483647L)
      sb <- Seq(b, -b)
    } yield (a, sb)
    val t1 = quads.toDF("a", "b")
    val r1 = t1.where(mysqlDiv4($"a", $"b") =!= 0)
      .select($"b", $"a", mysqlDiv4($"b", $"a" * 10000).cast("string").as("r"))
    assert(r1.count() === 20)
    // spot rows from the expected table
    val m1 = r1.as[(Long, Long, String)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(m1((-2147483647L, 2147483647L)) === "-0.0001")
    assert(m1((-1073741823L, 2147483647L)) === "0.0000")
    assert(m1((1L, -2147483647L)) === "0.0000")
    assert(m1((2147483647L, 2147483647L)) === "0.0001")

    // block 6 verbatim: |a|∈{1,…,5e9} vs ±9999999999 — a=±1 rows are
    // FILTERED (1/9999999999 rounds to 0.0000 → WHERE false), 16 stay
    val quads2 = for {
      (a, b) <- Seq((2147483647L, 9999999999L), (9999999999L, 2147483647L),
        (1L, 9999999999L), (4999999999L, 9999999999L), (5000000000L, 9999999999L))
      (sa, sb) <- Seq((a, b), (-a, b), (-a, -b), (a, -b))
    } yield (sa, sb)
    val t2 = quads2.toDF("a", "b")
    val r2 = t2.where(mysqlDiv4($"a", $"b") =!= 0)
      .select($"b", $"a", mysqlDiv4($"b", $"a" * 10000).cast("string").as("r"))
    assert(r2.count() === 16)
    val m2 = r2.as[(Long, Long, String)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(m2((-9999999999L, 2147483647L)) === "-0.0005")
    assert(m2((-9999999999L, -4999999999L)) === "0.0002")
    assert(m2((9999999999L, 5000000000L)) === "0.0002")
    assert(m2((-2147483647L, -9999999999L)) === "0.0000")
    assert(!m2.contains((9999999999L, 1L)) && !m2.contains((9999999999L, -1L)))
  }

  test("decimal_compare.test: 1/2 < decimal column") {
    // block 1 verbatim: a = 3 → 1/2 < a is true
    val t = Seq(BigDecimal(3)).toDF("a").select($"a".cast(DecimalType(9, 5)).as("a"))
    assert(t.select((mysqlDiv4(lit(1), lit(2)) < $"a").as("r"))
      .head.getBoolean(0))
  }

  test("cast_string_as_decimal.test: lax numeric-prefix parse") {
    // rows verbatim: '-123' → -123, '2006-01' → 2006 (prefix scan)
    val t = Seq("-123", "2006-01").toDF("a")
    val got = t.select(
      round(coalesce(try_to_number(
        regexp_extract($"a", "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)", 0)
          .cast("string"), lit("S999999999999999.999999")), lit(0)))
        .cast(DecimalType(10, 0)).cast("string").as("d"))
      .orderBy($"d").as[String].collect().toSeq
    assert(got === Seq("-123", "2006"))
  }

  test("unary_minus.test: signed, unsigned 2^63, double, decimal, filter") {
    // rows verbatim; u is MySQL bigint unsigned → Decimal(20,0) here
    val t = Seq(
      (1, Some(4L), Some(BigDecimal(4)), Some(1.25), Some(BigDecimal("1.23"))),
      (2, Some(-5L), Some(BigDecimal(5)), Some(-3.5), Some(BigDecimal("-4.56"))),
      (3, Some(500000000000000000L), Some(BigDecimal("9223372036854775808")),
        Some(2.5), Some(BigDecimal("0.00"))),
      (4, Option.empty[Long], Option.empty[BigDecimal],
        Option.empty[Double], Option.empty[BigDecimal]))
      .toDF("id", "i", "u", "f", "d")
      .select($"id", $"i", $"u".cast(DecimalType(20, 0)).as("u"), $"f",
        $"d".cast(DecimalType(10, 2)).as("d"))
    def col1(c: org.apache.spark.sql.Column): Seq[String] =
      t.select(c.cast("string")).orderBy($"id").as[String].collect().toSeq
    assert(col1(-$"i") === Seq("-4", "5", "-500000000000000000", null))
    // -u: negated unsigned 2^63 lands exactly on signed MIN
    assert(t.select((-$"u").cast("long").cast("string")).orderBy($"id")
      .as[String].collect().toSeq ===
      Seq("-4", "-5", "-9223372036854775808", null))
    assert(col1(-$"f") === Seq("-1.25", "3.5", "-2.5", null))
    assert(col1(-$"d") === Seq("-1.23", "4.56", "0.00", null))
    assert(t.where((-$"u").cast("long") === -5).select($"id")
      .as[Int].collect().toSeq === Seq(2))
  }

  test("logical_op.test: three-valued AND/OR/XOR/NOT, BETWEEN NULL, truthiness OR") {
    // t1 rows verbatim (string col elided where the query ignores it)
    val t1 = Seq(Option(0.0), Option(0.0), Option(12.991), Option(0.0),
      Option(0.0), Option(1.009), Option(-99.0), Option(12.991),
      Option(-9.183), Option.empty[Double]).toDF("b")
    // (b between null and 100) is null → all 10 rows
    val nullLow = lit(null).cast("double")
    assert(t1.where(($"b" >= nullLow && $"b" <= 100).isNull).count() === 10)

    // t3 truth tables verbatim: null AND/OR/XOR (a > 0), !null
    val t3 = Seq(0, 1).toDF("a")
    def tri(c: org.apache.spark.sql.Column): Seq[Option[Boolean]] =
      t3.select(c).orderBy($"a").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    val nullB = lit(null).cast("boolean")
    assert(tri(nullB && $"a" > 0) === Seq(Some(false), None))
    assert(tri(nullB || $"a" > 0) === Seq(None, Some(true)))
    assert(tri(nullB =!= ($"a" > 0)) === Seq(None, None)) // xor
    assert(tri(!nullB) === Seq(None, None))

    // HAVING min(null) and ... → empty (null filter drops groups)
    assert(t3.groupBy($"a")
      .agg(count(lit(1)).as("n"), min(lit(null).cast("int")).as("mn"))
      .where($"mn".isNotNull && $"a" > 0).count() === 0)

    // t4 verbatim (issue 5849): numeric truthiness of `a or b`
    val t4 = Seq((65, 1L), (66, 2L), (67, 3L), (0, 0L)).toDF("a", "b")
    assert(t4.select(($"a" =!= 0 || $"b" =!= 0).cast("int"))
      .as[Int].collect().toSeq === Seq(1, 1, 1, 0))
  }

  test("null_literal.test: NULL literals blank every expression family") {
    // single row verbatim; every WHERE must return zero rows
    val t = Seq((1L, 1.23, BigDecimal("1.234"), "string",
      java.sql.Timestamp.valueOf("2021-03-23 12:00:00.123456")))
      .toDF("ci", "cf", "cd", "cs", "ct")
    val nl = lit(null)
    // MySQL WHERE truthiness: each numeric operand of the OR chain is
    // independently "nonzero and non-NULL"
    def tr(c: org.apache.spark.sql.Column) = c.cast("double") =!= 0
    def empty(c: org.apache.spark.sql.Column): Unit =
      assert(t.where(c).count() === 0)
    // arithmetic: each op with NULL → NULL (OR-chain stays NULL)
    empty(tr($"ci" + nl) || tr($"ci" - nl) || tr($"ci" * nl) ||
      tr($"ci" / nl) || tr(try_divide($"ci", nl)))
    empty(tr($"cf" + nl) || tr($"cd" * nl) ||
      tr(try_to_number($"cs", lit("999")) + nl))
    // compare: every comparison with NULL → NULL
    empty($"ci" < nl || $"ci" <= nl || $"ci" > nl || $"ci" >= nl ||
      $"ci" === nl || $"ci" =!= nl)
    empty($"ct" < nl || $"ct" === nl)
    // conditional: nullif/case/if forms all yield NULL
    empty(tr(nullif($"ci", $"ci")) || tr(when(nl === $"ci", nl)) ||
      tr(when(nl.cast("boolean"), $"ci")))
    // cast: NULL casts stay NULL under every target type
    assert(t.where(nl.cast("long").isNotNull || nl.cast(DecimalType(10, 0)).isNotNull ||
      nl.cast("string").isNotNull || nl.cast("timestamp").isNotNull).count() === 0)
    // datetime + string functions with NULL args (string results go
    // through the same numeric-truthiness coercion)
    empty(tr(expr("date_format(ct, NULL)")))
    empty(tr(from_unixtime(nl)) || tr(substring($"cs", nl, nl)))
  }

  test("first_row.test: grouped aggregates — null keys group, empty input → zero rows") {
    // rows verbatim
    val t = Seq(
      (Option(1), Option.empty[Int], 1, 2, 1, 2),
      (Option.empty[Int], Option(2), 1, 2, 1, 2),
      (Option(1), Option(2), 1, 2, 1, 2))
      .toDF("c1", "c2", "c3", "c4", "c5", "c6")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Option[Int], Long)] =
      df.collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getLong(1))).toSet
    // cases 1-2: nullable keys (null forms its own group)
    assert(rows(t.groupBy($"c1").agg(count(lit(1)))) ===
      Set(Some(1) -> 2L, None -> 1L))
    assert(rows(t.groupBy($"c5").agg(count(lit(1)))) === Set(Some(1) -> 3L))
    // cases 3-4, 6, 9, 11: empty input → NO rows (not a null row)
    assert(t.where($"c1" > 10).groupBy($"c1").agg(count(lit(1))).count() === 0)
    assert(t.where($"c5" > 10).groupBy($"c5").agg(count(lit(1))).count() === 0)
    assert(t.where($"c3" > 10).groupBy($"c3").agg(count(lit(1))).count() === 0)
    assert(t.where($"c1" > 10).groupBy(($"c1" + $"c2").as("k"))
      .agg(count(lit(1))).count() === 0)
    // cases 5, 7-8, 10: not-null and expression keys
    assert(rows(t.groupBy($"c3").agg(count(lit(1)))) === Set(Some(1) -> 3L))
    assert(rows(t.groupBy(($"c1" + $"c2").as("k")).agg(count(lit(1)))) ===
      Set(None -> 2L, Some(3) -> 1L))
    assert(rows(t.groupBy(($"c5" + $"c6").as("k")).agg(count(lit(1)))) ===
      Set(Some(3) -> 3L))
    assert(rows(t.groupBy(($"c3" + $"c4").as("k")).agg(count(lit(1)))) ===
      Set(Some(3) -> 3L))
  }

  test("concat.test: NULL propagation, int coercion, group-by concat key") {
    // table 1 verbatim: both rows concat to NULL → one group of 2
    val t1 = Seq((Option.empty[String], Option("y")), (Option("x"), Option.empty[String]))
      .toDF("a", "b")
    val g1 = t1.groupBy(concat($"a", $"b").as("k")).agg(count(lit(1)).as("n")).collect()
    assert(g1.length === 1 && g1.head.isNullAt(0) && g1.head.getLong(1) === 2)

    // table 2 verbatim: ints coerce to their decimal string form
    val t2 = Seq(
      (Option(1), Option("次"), Option("测test试")),
      (Option(114), Option("null"), Option("112")),
      (Option.empty[Int], Option("114"), Option("614")),
      (Option(360), Option.empty[String], Option("-0-")),
      (Option(360), Option("124"), Option.empty[String]),
      (Option.empty[Int], Option.empty[String], Option.empty[String]))
      .toDF("a", "b", "c")
    val k = concat($"a".cast("string"), $"b", $"c")
    assert(t2.where(k.isNull).count() === 4)
    assert(t2.where(k === "114null112").count() === 1)
    assert(t2.where(k === "1次测test试").count() === 1)
    assert(t2.groupBy(concat($"a".cast("string"), lit(null).cast("string")).as("k"))
      .agg(count(lit(1)).as("n")).collect().map(_.getLong(1)).toSeq === Seq(6))
    val g2 = t2.groupBy(concat($"b").as("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(g2 === Map(Some("null") -> 1L, Some("124") -> 1L, None -> 2L,
      Some("114") -> 1L, Some("次") -> 1L))
  }

  test("upper_and_lower.test: Unicode case mapping incl. Cyrillic, CJK passthrough") {
    // rows verbatim (MySQL quotes '’' is a distinct codepoint from ''')
    val in = Seq("one week’s time TEST", "one week's time TEST",
      "abc测试DeF", "AbCテストAbC", "ѐёђѓєѕіїјЉЊЋЌЍЎЏ")
    val t = in.toDF("s")
    assert(t.select(upper($"s")).as[String].collect().toSeq === Seq(
      "ONE WEEK’S TIME TEST", "ONE WEEK'S TIME TEST",
      "ABC测试DEF", "ABCテストABC", "ЀЁЂЃЄЅІЇЈЉЊЋЌЍЎЏ"))
    assert(t.select(lower($"s")).as[String].collect().toSeq === Seq(
      "one week’s time test", "one week's time test",
      "abc测试def", "abcテストabc", "ѐёђѓєѕіїјљњћќѝўџ"))
  }
}
