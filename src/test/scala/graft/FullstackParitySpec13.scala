package graft

import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat._

/** Thirteenth tranche — reference regression fixtures mirrored
  * verbatim (`/root/reference/tests/fullstack-test/{issues,mpp}/`):
  * lax string truthiness in WHERE (issue_3447), cross-scale decimal
  * join keys (issue_4519, adapted to the engine's 38-digit cap),
  * GROUP BY a constant (issue_1796), `<> ANY` via its EXISTS rewrite
  * (having.test), window AVG decimal widening over 10k rows
  * (issue10045), LOG(0)=NULL filtering (issue_8113), an always-NULL
  * join condition (issue_8562), supplementary-plane case mapping
  * (issue_7695), count over all-NULL and all-empty columns
  * (issue_10809), and duration fractional-scale rounding (issue_8601). */
class FullstackParitySpec13 extends SparkTestBase {
  import spark.implicits._

  test("issue_3447: MySQL numeric-prefix truthiness of char(5) in WHERE") {
    val t = Seq("0.1", "-0.1", "0.0", "-1", "a0.1", "0x01").toDF("a")
    // '0.1'/'-0.1'/'-1' parse to nonzero; '0.0' is zero; 'a0.1' and
    // '0x01' have numeric prefixes '' and '0' — both zero → filtered
    val kept = t.filter(mysql_istrue(mysql_cast_real($"a")) === 1)
      .collect().map(_.getString(0)).toSeq
    assert(kept === Seq("0.1", "-0.1", "-1"))
  }

  test("issue_4519: decimal join keys across (24,10)/(20,20)/(28,0) scales") {
    // rows verbatim; precisions re-capped from the fixture's
    // decimal(65,*) so every PAIRWISE comparison widens exactly within
    // the engine's 38-digit maximum (24,10 vs 20,20 → 34; 24,10 vs
    // 28,0 → 38) — at (38,10) vs (38,0) Spark must drop fractional
    // digits to compare and 0.1 = 0 would "match", the documented
    // boundary of the 38-digit cap
    val t = Seq(("0.1", "0.1", "1"), ("1.0", "0.1", "1"), ("0", "0", "0"),
      (null, null, null), ("99.9", "0.99", "99"))
      .toDF("c1", "c2", "c3")
      .select($"c1".cast("decimal(24,10)").as("col1"),
        $"c2".cast("decimal(20,20)").as("col2"),
        $"c3".cast("decimal(28,0)").as("col3"))
    t.createOrReplaceTempView("i4519_t")

    val j12 = spark.sql(
      """select t1.col1, t2.col2 from i4519_t t1
        |join i4519_t t2 on t1.col1 = t2.col2""".stripMargin).collect()
    assert(j12.map(r => (r.getDecimal(0).toPlainString,
        r.getDecimal(1).toPlainString)).sorted.toSeq === Seq(
      ("0.0000000000", "0.00000000000000000000"),
      ("0.1000000000", "0.10000000000000000000"),
      ("0.1000000000", "0.10000000000000000000")))

    val j13 = spark.sql(
      """select t1.col1, t2.col3 from i4519_t t1
        |join i4519_t t2 on t1.col1 = t2.col3""".stripMargin).collect()
    assert(j13.map(r => (r.getDecimal(0).toPlainString,
        r.getDecimal(1).toPlainString)).sorted.toSeq === Seq(
      ("0.0000000000", "0"),
      ("1.0000000000", "1"), ("1.0000000000", "1")))
  }

  test("issue_4519 boundary: at (38,10) vs (38,0) the comparison loses the fraction") {
    // the documented cost of the 38-digit cap (the reference compares
    // decimal(65,*) natively): widening (38,10)↔(38,0) cannot keep
    // both 38 integer digits and 10 fractional ones, so Spark compares
    // at reduced scale and 0.1 "equals" 0
    val t = Seq("0.1").toDF("c").select($"c".cast("decimal(38,10)").as("a"),
      lit(0).cast("decimal(38,0)").as("b"))
    assert(t.filter($"a" === $"b").count() === 1)
  }

  test("issue_1796: GROUP BY a constant groups all rows into one") {
    val t = Seq(("2018-11-22 16:55:24", 1), ("2018-11-23 00:55:24", 1))
      .toDF("s", "b").select(to_timestamp($"s").as("a"), $"b")
    val r = t.groupBy(lit("a")).agg(max($"a").as("mx")).collect()
    assert(r.length === 1)
    assert(r.head.getTimestamp(1).toString === "2018-11-23 00:55:24.0")
  }

  test("having.test: value <> ANY(subquery) keeps rows with any unequal match") {
    val t1 = Seq((0, "aaa"), (1, "bbb"), (2, "ccc")).toDF("id", "value")
    val t2 = Seq((0, "ddd"), (1, "eee"), (2, "ccc")).toDF("id", "value")
    t1.createOrReplaceTempView("hav_t1")
    t2.createOrReplaceTempView("hav_t2")
    // x <> ANY(S) ≡ EXISTS(v ∈ S: x <> v): even 'ccc' survives since
    // 'ccc' <> 'ddd' (fixture returns all three rows)
    val rows = spark.sql(
      """select id, value from hav_t1
        |where exists(select 1 from hav_t2 where hav_t1.value <> hav_t2.value)
        |order by id""".stripMargin).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((0, "aaa"), (1, "bbb"), (2, "ccc")))
  }

  test("issue10045: window AVG over decimal(5,0) widens its sum past the input type") {
    // 10 × 2^10 = 10240 rows of 10000: the naive decimal(5,0) sum
    // overflows at row 10; both the reference and Spark widen the
    // accumulator, so avg comes back exact with scale +4
    val rows = spark.sparkContext.parallelize(Seq.fill(10240)((1, BigDecimal(10000))))
    val t = spark.createDataFrame(rows).toDF("id", "value")
      .select($"id", $"value".cast("decimal(5,0)").as("value"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val r = t.select($"id", $"value", avg($"value").over(w).as("a")).limit(1)
      .collect().head
    assert(r.getDecimal(2).compareTo(new java.math.BigDecimal("10000.0000")) === 0)
  }

  test("issue_8113: LOG of a false BOOL is NULL and filters the row") {
    val t0 = Seq(false).toDF("c0")
    // MySQL LOG(0) = NULL with a warning; Spark ln(0) is likewise NULL
    assert(t0.filter(mysql_istrue(log($"c0".cast("int"))) === 1).count() === 0)
    assert(t0.select(log($"c0".cast("int"))).collect().head.isNullAt(0))
  }

  test("issue_8562: always-NULL join condition null-extends every left row") {
    val t = Seq((30, 50), (300, 500)).toDF("a", "b")
    // ON if(a, null, null): the condition is NULL for every pair →
    // no match → all left rows null-extended
    val cond = when($"l.a" =!= 0, lit(null).cast("boolean"))
      .otherwise(lit(null).cast("boolean"))
    val j = t.as("l").join(t.as("r"), cond, "left_outer")
      .select(col("l.a"), col("l.b"), col("r.a").as("ra"), col("r.b").as("rb"))
      .orderBy(col("l.a")).collect()
    assert(j.map(r => (r.getInt(0), r.getInt(1), r.isNullAt(2), r.isNullAt(3)))
      .toSeq === Seq((30, 50, true, true), (300, 500, true, true)))
  }

  test("issue_7695: supplementary-plane (Adlam) case mapping in lower()") {
    val t = Seq("𞤀").toDF("a") // 𞤀 U+1E900 ADLAM CAPITAL ALIF
    val r = t.select($"a", lower($"a").as("l")).collect().head
    assert(r.getString(1) === "𞤢") // 𞤢 U+1E922
    // and lower(a) no longer equals the capital form
    assert(t.filter(lower($"a") === "𞤀").count() === 0)
  }

  test("issue_10809: counts over all-NULL and all-empty-string columns") {
    val n = 128
    val tNull = spark.range(1, n + 1)
      .select($"id", lit(null).cast("string").as("v"))
    val cn = tNull.agg(count(lit(1)).as("c"), count($"v").as("cv")).collect().head
    assert(cn.getLong(0) === 128L && cn.getLong(1) === 0L)
    val tEmpty = spark.range(1, n + 1).select($"id", lit("").as("v"))
    val ce = tEmpty.agg(count(lit(1)).as("c"), sum(length($"v")).as("sl"))
      .collect().head
    assert(ce.getLong(0) === 128L && ce.getLong(1) === 0L)
  }

  test("issue_8601: duration fractional seconds round half-up at scale, away from zero") {
    // time(4) storage of '±700:10:10.123456' keeps .1234+round → .1235;
    // widening to time(6) renders .123500 (microseconds-encoded here)
    val usOf = (h: Long, m: Long, s: Long, f: Long) =>
      ((h * 60 + m) * 60 + s) * 1000000L + f
    val t = Seq(usOf(700, 10, 10, 123456), -usOf(700, 10, 10, 123456)).toDF("us")
    // round magnitude at scale 4 (quantum 100 us), sign restored;
    // floor() because Column./ is double division
    val rounded = t.select(
      (signum($"us").cast("long") *
        floor((abs($"us") + 50L) / 100L).cast("long") * 100L).as("r"))
      .collect().map(_.getLong(0)).toSeq
    val want = usOf(700, 10, 10, 123500)
    assert(rounded === Seq(want, -want))
    // and the component render agrees with the fixture's output
    val parts = t.select(
      mysql_extract_dur("HOUR", $"us").as("h"),
      mysql_extract_dur("MICROSECOND",
        signum($"us").cast("long") *
          floor((abs($"us") + 50L) / 100L).cast("long") * 100L).as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(parts === Seq((700L, 123500L), ((-700L), (-123500L))))
  }
}
