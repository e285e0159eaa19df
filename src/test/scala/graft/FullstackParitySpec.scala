package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Direct parity with the reference's own fullstack test transcripts
  * (`/root/reference/tests/fullstack-test/expr/<name>.test`): the literal
  * input rows and expected outputs from the reference suite, mirrored
  * on Spark. Where MySQL semantics diverge from Spark built-ins the
  * `MySqlCompat` wrappers close the gap (least/greatest NULL
  * poisoning, mod-by-zero). */
class FullstackParitySpec extends SparkTestBase {
  import spark.implicits._

  test("compare_null.test: three-valued BETWEEN/IN with NULL bounds") {
    // expr/compare_null.test:26-44
    val t = Seq("2024-08-26", "2024-08-25", "2024-08-24", "2024-08-23")
      .map(Date.valueOf).toDF("a")
    assert(t.filter(expr("a between NULL and '2024-08-25'")).count() === 0L)
    val notBetween = t.filter(expr("not (a between NULL and '2024-08-25')"))
      .collect().map(_.getDate(0).toString)
    assert(notBetween.toSeq === Seq("2024-08-26"),
      "NOT(between NULL..) keeps only rows where the comparison is definitively false")
    assert(t.filter(expr("a in (NULL)")).count() === 0L)
    assert(t.filter(expr("a not in (NULL)")).count() === 0L)
  }

  test("least_greatest.test: NULL argument poisons the result") {
    // expr/least_greatest.test t1 rows + expected least outputs
    val t1 = Seq(
      (1, 10, 20, 30, 40L, 50f, 60d, 70, 80),
      (90, 80, 70, 60, 50L, 40f, 30d, 20, 10),
      (1278, 127, 1297, 878, 127319L, 17281.3278f, 227183.1231823618d, 121, 17319))
      .toDF("id", "id1", "id2", "id3", "id4", "id5", "id6", "id7", "id8")
    val cols = Seq($"id", $"id1", $"id2", $"id3", $"id4", $"id5", $"id6", $"id7", $"id8")
    val got = t1.orderBy($"id")
      .select($"id", least(cols: _*).cast("double")).collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    assert(got.toSeq === Seq((1, 1.0), (90, 10.0), (1278, 121.0)))
    // MySQL: least(NULL, ...) is NULL for every row; Spark's builtin
    // skips nulls, the compat wrapper restores reference semantics
    val withNull = t1.select(mysql_least(lit(null) +: cols: _*)).collect()
    assert(withNull.forall(_.isNullAt(0)))
    val builtinSkips = t1.select(least(lit(null) +: cols: _*)).collect()
    assert(builtinSkips.forall(!_.isNullAt(0)), "documents the Spark divergence")
  }

  test("mod.test t6: real mod — sign follows dividend, zero divisor is NULL") {
    // expr/mod.test:145-160 expected values verbatim
    val t6 = Seq(
      (1, Some(1.3), 1.1), (2, Some(-1.3), 1.1), (3, Some(1.3), -1.1),
      (4, Some(-1.3), -1.1), (5, Some(3.3), 1.1), (6, Some(3.3), -1.1),
      (7, Some(-3.3), 1.1), (8, Some(-3.3), -1.1), (9, Some(1.2), 0.0),
      (10, None, 0.0)).toDF("id", "a", "b")
    val got = t6.orderBy($"id")
      .select($"id", mysql_mod($"a", $"b").as("m")).collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    val expected = Seq(
      (1, 0.19999999999999996), (2, -0.19999999999999996),
      (3, 0.19999999999999996), (4, -0.19999999999999996),
      (5, 1.0999999999999996), (6, 1.0999999999999996),
      (7, -1.0999999999999996), (8, -1.0999999999999996),
      (9, null), (10, null))
    assert(got.toSeq === expected)
  }

  test("in_expression.test: mixed-type IN lists over decimals and narrow ints") {
    // expr/in_expression.test:21-40 (issues tics#1483, tidb#23198, tics#1543)
    val t = Seq((BigDecimal("1.00"), -80, -1, BigDecimal("1")),
      (BigDecimal("3.00"), -90, -3, BigDecimal("0")))
      .toDF("a", "b", "c", "d")
      .select(col("a").cast("decimal(4,2)").as("a"), col("b").cast("tinyint").as("b"),
        col("c"), col("d").cast("decimal(38,18)").as("d"))
    val r1 = t.filter(expr("a in (1.0, 2)")).select("a").collect()
    assert(r1.map(_.getDecimal(0).toPlainString).toSeq === Seq("1.00"))
    // out-of-tinyint-range members: empty, not an overflow error
    assert(t.filter(expr("b in (-302764853, 12498864)")).count() === 0L)
    // beyond-bigint literal member: empty, not an error
    assert(t.filter(expr("c in (1, 18446744073709551616)")).count() === 0L)
    // duplicate list members dedupe
    assert(t.filter(expr("d in (1, 1)")).count() === 1L)
    // NOT mirrored: `d in (2, 'y')` — MySQL laxly coerces 'y' to 0 and
    // matches d=0; ANSI Spark raises on the malformed cast (EdgeCasesSpec
    // documents the strict-vs-lax contract)
  }

  test("window_range_frame.test: first/last_value over RANGE frames, rows verbatim") {
    // mpp/window_range_frame.test:17-43,370-391 — 17-row fixture, frames
    // `range between 3 preceding and 0 following` (first_value) and
    // `range between 0 preceding and 3 following` (last_value).
    import org.apache.spark.sql.expressions.Window
    val t = Seq((0, 0, 0), (1, 1, 1), (1, 2, 2), (1, 4, 4), (1, 8, 8),
      (2, 0, 0), (2, 3, 3), (2, 10, 10), (2, 13, 13), (2, 15, 15),
      (3, 1, 1), (3, 3, 3), (3, 5, 5), (3, 9, 9), (3, 15, 15),
      (3, 20, 20), (3, 31, 31)).toDF("p", "o", "v")
    val wPrec = Window.partitionBy($"p").orderBy($"o").rangeBetween(-3, 0)
    val gotFirst = t.select($"p", $"o", first($"v").over(wPrec).as("a"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2))).toMap
    val expFirst = Map(
      (1, 1) -> 1, (1, 2) -> 1, (1, 4) -> 1, (1, 8) -> 8,
      (2, 0) -> 0, (2, 3) -> 0, (2, 10) -> 10, (2, 13) -> 10, (2, 15) -> 13,
      (3, 1) -> 1, (3, 3) -> 1, (3, 5) -> 3, (3, 9) -> 9, (3, 15) -> 15,
      (3, 20) -> 20, (3, 31) -> 31, (0, 0) -> 0)
    assert(gotFirst === expFirst)
    val wFoll = Window.partitionBy($"p").orderBy($"o").rangeBetween(0, 3)
    val gotLast = t.select($"p", $"o", last($"v").over(wFoll).as("a"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2))).toMap
    val expLast = Map(
      (1, 1) -> 4, (1, 2) -> 4, (1, 4) -> 4, (1, 8) -> 8,
      (3, 1) -> 3, (3, 3) -> 5, (3, 5) -> 5, (3, 9) -> 9, (3, 15) -> 15,
      (3, 20) -> 20, (3, 31) -> 31,
      (2, 0) -> 3, (2, 3) -> 3, (2, 10) -> 13, (2, 13) -> 15, (2, 15) -> 15,
      (0, 0) -> 0)
    assert(gotLast === expLast)
  }

  test("cast_string_as_int.test: lax prefix parse and unsigned wraparound") {
    // expr/cast_string_as_int.test (tics#1469): '-123' and '2006-01'
    // under MySQL casts — '2006-01' parses its numeric prefix 2006;
    // cast(-123 as unsigned) wraps to 2^64-123.
    val t = Seq("-123", "2006-01").toDF("a")
    val signedHits = t.filter(mysql_cast_signed($"a") === -123)
      .collect().map(_.getString(0)).toSeq
    assert(signedHits === Seq("-123"))
    val prefixHits = t.filter(mysql_cast_signed($"a") === 2006)
      .collect().map(_.getString(0)).toSeq
    assert(prefixHits === Seq("2006-01"))
    val unsignedHits = t
      .filter(mysql_cast_unsigned(mysql_cast_signed($"a")) === mysql_cast_unsigned(lit(-123)))
      .collect().map(_.getString(0)).toSeq
    assert(unsignedHits === Seq("-123"))
    assert(Seq("-123").toDF("a")
      .select(mysql_cast_unsigned(mysql_cast_signed($"a")).cast("string"))
      .first().getString(0) === "18446744073709551493")
    // no leading digits → NULL (MySQL warns + returns 0; the NULL form
    // is the reference's pushed-down strict-ish variant; documented)
    assert(Seq("abc").toDF("a").select(mysql_cast_signed($"a")).first().isNullAt(0))
  }

  test("hex_str.test: hex of UTF-8 strings incl. multibyte and emoji") {
    // expr/hex_str.test:30-46 expected verbatim
    val rows = Seq(
      "www.pingcap.com" -> "7777772E70696E676361702E636F6D",
      "abcd" -> "61626364",
      "测试测试测试测试abcd测试" ->
        "E6B58BE8AF95E6B58BE8AF95E6B58BE8AF95E6B58BE8AF9561626364E6B58BE8AF95",
      "さらに入" -> "E38195E38289E381ABE585A5",
      "🍻" -> "F09F8DBB",
      "\t" -> "09",
      "\n" -> "0A")
    val got = rows.map(_._1).toDF("a")
      .select(col("a"), hex(col("a")).as("h")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach { case (in, expected) => assert(got(in) === expected, s"hex($in)") }
    val nullHex = Seq(Option.empty[String]).toDF("a").select(hex(col("a"))).first()
    assert(nullHex.isNullAt(0))
  }

  test("left_semi_family_joins.test: WHERE-context IN/NOT IN families match reference rows") {
    // mpp/left_semi_family_joins.test — fixture t(a NOT NULL, b NULL) and
    // the expected rows for every semi/anti family, verbatim. Spark's
    // WHERE-context IN/NOT IN is ANSI three-valued, same as the
    // reference's NullAware joins, so the row sets must agree exactly.
    val t = Seq((1, Some(1)), (1, Some(2)), (2, Some(1)), (1, Some(3)),
      (2, Some(3)), (1, Option.empty[Int]), (2, Option.empty[Int])).toDF("a", "b")
    t.createOrReplaceTempView("lsf_t")
    def rows(pred: String): Seq[(Int, Option[Int])] =
      spark.sql(s"select a, b from lsf_t t1 where $pred")
        .collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
        .toSeq.sortBy(x => (x._1, x._2.getOrElse(Int.MinValue)))
    def exp(rows: (Int, Option[Int])*): Seq[(Int, Option[Int])] =
      rows.sortBy(x => (x._1, x._2.getOrElse(Int.MinValue)))
    // simple left semi: all rows survive
    assert(rows("t1.a>1 or t1.a in (select a from lsf_t)") ===
      exp((1, Some(1)), (1, Some(2)), (2, Some(1)), (1, Some(3)), (2, Some(3)),
        (1, None), (2, None)))
    // left semi with correlated other-condition
    assert(rows("t1.a>1 or t1.a in (select a from lsf_t where b < t1.b)") ===
      exp((1, Some(2)), (2, Some(1)), (1, Some(3)), (2, Some(3)), (2, None)))
    // simple left anti
    assert(rows("t1.a>1 or t1.a not in (select a from lsf_t)") ===
      exp((2, Some(1)), (2, Some(3)), (2, None)))
    // left anti with correlated other-condition
    assert(rows("t1.a>1 or t1.a not in (select a from lsf_t where b < t1.b)") ===
      exp((1, Some(1)), (2, Some(1)), (2, Some(3)), (1, None), (2, None)))
    // cartesian left semi (nullable probe column)
    assert(rows("t1.a>1 or t1.b in (select a from lsf_t)") ===
      exp((1, Some(1)), (1, Some(2)), (2, Some(1)), (2, Some(3)), (2, None)))
    // cartesian left semi with other condition (nullable build column)
    assert(rows("t1.a>1 or t1.a in (select b from lsf_t where b < t1.b)") ===
      exp((1, Some(2)), (2, Some(1)), (1, Some(3)), (2, Some(3)), (2, None)))
    // cartesian simple left anti
    assert(rows("t1.a>1 or t1.b not in (select a from lsf_t)") ===
      exp((2, Some(1)), (1, Some(3)), (2, Some(3)), (2, None)))
    // cartesian left anti with other condition
    assert(rows("t1.a>1 or t1.b not in (select a from lsf_t where b < t1.b)") ===
      exp((1, Some(1)), (2, Some(1)), (1, Some(3)), (2, Some(3)), (1, None), (2, None)))
  }

  test("left_semi_family_joins.test scalar: projected IN flag three-valued truth table") {
    // mpp/left_semi_family_joins.test "as scalar test": probe {0,1,2,NULL}
    // vs build {0,1,NULL} — reference expects in: [1,1,NULL,NULL],
    // not-in: [0,0,NULL,NULL]. Reconstructed with q46b's broadcast
    // machinery (Coverage.q46bNullAwareSemiFlag) since Spark's
    // ExistenceJoin folds the projected UNKNOWN to false.
    val build = Seq(Some(0), Some(1), Option.empty[Int]).toDF("v")
    val probe = Seq(Some(0), Some(1), Some(2), Option.empty[Int]).toDF("x")
    val stats = build.agg(count(lit(1)).as("n_total"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"))
    val vals = build.filter(col("v").isNotNull).distinct()
    val flag = when(col("v").isNotNull, lit(true))
      .when(col("x").isNull && col("n_total") > 0, lit(null).cast("boolean"))
      .when(col("n_null") > 0, lit(null).cast("boolean"))
      .otherwise(lit(false))
    val got = probe
      .join(broadcast(vals), col("x") === col("v"), "left")
      .crossJoin(broadcast(stats))
      .select(col("x"), flag.as("in_flag"), (!flag).as("not_in_flag"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        if (r.isNullAt(1)) None else Some(r.getBoolean(1)),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toSet
    assert(got === Set(
      (Some(0), Some(true), Some(false)),
      (Some(1), Some(true), Some(false)),
      (Some(2), None, None),
      (None, None, None)))
  }

  test("right_semi_family_join.test: EXISTS/NOT EXISTS rows invariant to build side") {
    // mpp/right_semi_family_join.test — the reference runs the same
    // semi/anti queries with the build side forced to either input
    // (broadcast thresholds 0 vs large); results must not change.
    // Spark analog: broadcast-off (shuffle join) vs broadcast-on.
    val a = Seq((0, "a"), (2, "b"), (5, "c")).toDF("id", "value")
    val b = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "value")
    a.createOrReplaceTempView("rsf_a")
    b.createOrReplaceTempView("rsf_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    def run(pred: String): Set[(Int, String)] =
      spark.sql(s"select id, value from rsf_a a where $pred")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    try {
      for (threshold <- Seq("-1", "10485760")) {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        assert(run("exists (select * from rsf_b b where a.id = b.id)") ===
          Set((2, "b")), s"exists @threshold=$threshold")
        assert(run("not exists (select * from rsf_b b where a.id = b.id)") ===
          Set((0, "a"), (5, "c")), s"not-exists @threshold=$threshold")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("apply.test: non-equi correlated scalar subquery count matches reference") {
    // mpp/apply.test — fixture: 8 seed rows, then 9 rounds of
    // `insert into t select a+5, b+5 from t` (doubling with shift) →
    // 4096 rows; expected count(*) where a > (select avg(b) from t t1
    // where t.a > t1.a) is 4094, identical with parallel apply on/off.
    // fixture built driver-side (one 4096-row LocalRelation — the
    // 9-level union-of-projections plan decorrelates into a 512×512
    // leaf join and chokes the optimizer, which is a plan-size issue,
    // not a semantics one)
    var rows = Seq((1, 2), (2, 1), (10, 15), (15, 10), (20, 25), (25, 10),
      (18, 19), (19, 18))
    for (_ <- 1 to 9) rows = rows ++ rows.map { case (a, b) => (a + 5, b + 5) }
    val t = rows.toDF("a", "b")
    assert(t.count() === 4096L)
    t.createOrReplaceTempView("apply_t")
    val n = spark.sql(
      """select count(*) from apply_t t
        |where a > (select avg(b) from apply_t t1 where t.a > t1.a)""".stripMargin)
      .first().getLong(0)
    assert(n === 4094L)
  }

  test("nulleq.test: <=> truth table on (1,NULL),(NULL,1)") {
    // expr/nulleq.test:22-29 expected verbatim (1=true, 0=false)
    val t = Seq((Some(1), Option.empty[Int]), (Option.empty[Int], Some(1))).toDF("a", "b")
    val got = t.select(
      expr("a <=> NULL").cast("int"), expr("b <=> NULL").cast("int"),
      expr("a <=> 1").cast("int"), expr("b <=> 1").cast("int"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSet === Set((0, 1, 1, 0), (1, 0, 0, 1)))
  }

  test("round_with_frac.test: variable-frac decimal round, folded sum verbatim") {
    // expr/round_with_frac.test test.t rows: -66..31 plus the int64
    // extremes as FRAC values against a decimal(36,18) constant; the
    // reference's expected folded sum is verbatim below. Extremes prove
    // the out-of-range branches: frac >= scale -> x unchanged, frac
    // below -(p-s) -> 0.
    val fracs = ((-66 to 31).map(_.toLong) ++
      Seq(Long.MaxValue, Long.MinValue)).toDF("i")
    val x = lit("123456789123456789.123456789123456789")
      .cast(org.apache.spark.sql.types.DecimalType(36, 18))
    val got = fracs
      .agg(sum(mysql_round_frac(x, col("i"), 38, 18)).as("s"))
      .head().getDecimal(0)
    assert(got.toPlainString == "6145515733034404630.923293528812182425",
      s"folded variable-frac sum diverges: $got")
    // round(NULL, i) stays NULL for every frac
    val nullSum = fracs
      .agg(sum(mysql_round_frac(lit(null), col("i"), 38, 18)))
      .head()
    assert(nullSum.isNullAt(0))
  }

  test("round_with_frac.test: d9 decimal(9,4) constant-frac matrix verbatim") {
    // expr/round_with_frac.test d9 rows and the (-1, 0, 1) expected
    // columns — MySQL rounds decimals half AWAY from zero (25 @ -1 ->
    // 30, 0.25 @ 1 -> 0.3), which is HALF_UP on both engines.
    val rows = Seq(
      ("0", 0.0, 0.0, 0.0), ("0.25", 0.0, 0.0, 0.3),
      ("-0.25", 0.0, 0.0, -0.3), ("0.0499", 0.0, 0.0, 0.0),
      ("0.05", 0.0, 0.0, 0.1), ("-0.0499", 0.0, 0.0, 0.0),
      ("-0.05", 0.0, 0.0, -0.1), ("49999.9999", 50000.0, 50000.0, 50000.0),
      ("50000", 50000.0, 50000.0, 50000.0),
      ("-49999.9999", -50000.0, -50000.0, -50000.0),
      ("-50000", -50000.0, -50000.0, -50000.0),
      ("99999.9999", 100000.0, 100000.0, 100000.0),
      ("-99999.9999", -100000.0, -100000.0, -100000.0),
      ("25", 30.0, 25.0, 25.0), ("-25", -30.0, -25.0, -25.0))
    val df = rows.map(_._1).toDF("a")
      .select(col("a").cast(org.apache.spark.sql.types.DecimalType(9, 4)))
    def rf(k: Int) = mysql_round_frac(col("a"), lit(k), 9, 4).cast("double")
    val got = df.select(col("a").cast("string"), rf(-1), rf(0), rf(1))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    val expected = rows.map { case (a, m1, z, p1) =>
      (new java.math.BigDecimal(a).setScale(4).toPlainString, m1, z, p1)
    }
    assert(got.toSeq.sortBy(_._1) === expected.sortBy(_._1))
  }

  test("tidb_truncate.test: t1 double rows and t2 string rows verbatim") {
    // expr/tidb_truncate.test t1: (c1 double, c2 digits) -> expected,
    // including the max-double identity row, ±huge digit counts, and
    // the NULL row
    val t1 = Seq[(Option[Double], Long, Option[Double])](
      (Some(-1.23), 0L, Some(-1.0)), (Some(1.58), 0L, Some(1.0)),
      (Some(1.298), 1L, Some(1.2)), (Some(123.2), -1L, Some(120.0)),
      (Some(123.2), 100L, Some(123.2)), (Some(123.2), -100L, Some(0.0)),
      (Some(1.7976931348623157e308), 2L, Some(1.7976931348623157e308)),
      (None, 2L, None),
      (Some(1.1), 400L, Some(1.1)), (Some(1.1), -400L, Some(0.0)),
      (Some(0.0), 400L, Some(0.0)), (Some(0.0), -400L, Some(0.0)),
      (Some(1.1), 3L, Some(1.1)), (Some(0.0), 3L, Some(0.0)),
      (Some(99.99), 1L, Some(99.9)), (Some(99.99), -1L, Some(90.0)),
      (Some(-99.99), 1L, Some(-99.9)), (Some(-99.99), -1L, Some(-90.0)),
      (Some(0.0001), 3L, Some(0.0)), (Some(0.0001), -3L, Some(0.0)))
    val got1 = t1.map { case (c1, c2, _) => (c1, c2) }.toDF("c1", "c2")
      .select(mysql_truncate(col("c1"), col("c2"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got1.toSeq === t1.map(_._3), "t1 double truncation diverges")

    // t2: string inputs cast through double, same digit semantics
    val t2 = Seq(
      ("-1.23", 0L, -1.0), ("-1.23", 1L, -1.2), ("-11.23", -1L, -10.0),
      ("1.58", 0L, 1.0), ("1.58", 1L, 1.5), ("11.58", -1L, 10.0),
      ("23.298", -1L, 20.0), ("23.298", -100L, 0.0),
      ("23.298", 100L, 23.298))
    val got2 = t2.map { case (c1, c2, _) => (c1, c2) }.toDF("c1", "c2")
      .select(mysql_truncate(col("c1"), col("c2"))).collect()
      .map(_.getDouble(0))
    assert(got2.toSeq === t2.map(_._3), "t2 string truncation diverges")
  }
}
