package graft

import org.apache.spark.sql.functions._

import graft.functions.MySqlCompat

/** Thirty-seventh tranche: issue-regression fixtures mirrored
  * (`/root/reference/tests/fullstack-test/issues/issue_4519.test`,
  * `issues/issue_7695.test`, `issues/issue_8562.test`,
  * `issues/issue_8601.test`, `issues/issue_8607.test`,
  * `issues/issue_8767.test`, `issues/issue_8799.test`,
  * `issues/issue_8811.test`, `issues/issue_1796.test`): decimal joins
  * across mismatched scales, supplementary-plane case mapping,
  * constant-NULL join conditions, TIME(fsp) precision changes,
  * CHAR(n) cast truncation, =ALL / =SOME rewrites on empty and
  * correlated inputs, and constant-key grouped MAX over timestamps.
  */
class FullstackParitySpec37 extends SparkTestBase {
  import spark.implicits._

  test("issue_4519: decimal equality joins across (30,10)/(21,20)/(25,0) scales") {
    // reference columns are decimal(65,10)/(20,20)/(65,0); widths here
    // stay under Spark's 38 cap WITH widening headroom — at the full
    // p=38 the equality coercion would have to drop scale entirely
    // (0.1 = 0 would spuriously match), the documented Decimal(38)
    // divergence
    val t = Seq(("0.1", "0.1", "1"), ("1.0", "0.1", "1"), ("0", "0", "0"),
      (null, null, null), ("99.9", "0.99", "99"))
      .toDF("c1s", "c2s", "c3s")
      .select($"c1s".cast("decimal(30,10)").as("col1"),
        $"c2s".cast("decimal(21,20)").as("col2"),
        $"c3s".cast("decimal(25,0)").as("col3"))
    val j12 = t.as("t1").join(t.as("t2"), $"t1.col1" === $"t2.col2")
      .select($"t1.col1".cast("string"), $"t2.col2".cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(j12.sorted.toSeq === Seq(
      ("0.0000000000", "0.00000000000000000000"),
      ("0.1000000000", "0.10000000000000000000"),
      ("0.1000000000", "0.10000000000000000000")))
    val j13 = t.as("t1").join(t.as("t2"), $"t1.col1" === $"t2.col3")
      .select($"t1.col1".cast("string"), $"t2.col3".cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(j13.sorted.toSeq === Seq(
      ("0.0000000000", "0"),
      ("1.0000000000", "1"), ("1.0000000000", "1")))
  }

  test("issue_7695: supplementary-plane (Adlam) lower() maps outside the BMP") {
    val t = Seq("𞤀").toDF("a") // 𞤀 U+1E900 ADLAM CAPITAL ALEF
    val lowered = t.select(lower($"a")).head().getString(0)
    assert(lowered === "𞤢", // 𞤢 U+1E922 ADLAM SMALL ALEF
      s"ADLAM capital must lower to the small letter, got ${lowered.codePoints().toArray.toSeq}")
    // and the lowered form no longer equals the capital
    assert(t.where(lower($"a") === "𞤀").isEmpty)
  }

  test("issue_8562: LEFT join on a constant-NULL condition null-extends every row") {
    val t1 = Seq((30, 50), (300, 500)).toDF("a", "b")
    val t2 = Seq((30, 50), (300, 500)).toDF("a", "b")
    // ON if(a, null, null) is NULL for every row → no match ever
    val j = t2.as("l").join(t1.as("r"),
      when($"l.a" =!= 0, lit(null).cast("boolean"))
        .otherwise(lit(null).cast("boolean")), "left")
    val rows = j.select($"l.a", $"l.b", $"r.a", $"r.b").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.get(2), r.get(3))).toSet
    assert(rows === Set((30, 50, null, null), (300, 500, null, null)))
  }

  test("issue_8601: TIME(fsp) precision changes re-render with rounding carry") {
    // inserted at time(4): 700:10:10.123456 rounds half-up to .1235
    val insNs = Seq(2520610123456000L, -2520610123456000L).toDF("ns")
    def roundFsp(c: org.apache.spark.sql.Column, fsp: Int) = {
      val q = math.pow(10, 9 - fsp).toLong
      // half-away rounding on the magnitude, sign reapplied
      (when(c < 0, lit(-1L)).otherwise(lit(1L)) *
        ((abs(c) + q / 2) - (abs(c) + q / 2) % q)).cast("long")
    }
    val at4 = insNs.select(roundFsp($"ns", 4).as("ns"))
    // fsp4 storage rendered at fsp6 pads zeros: .123500
    assert(at4.select(MySqlCompat.mysql_duration_str($"ns", 6)).collect()
      .map(_.getString(0)).toSeq ===
      Seq("700:10:10.123500", "-700:10:10.123500"))
    // modify to time(2): .1235 rounds to .12
    val at2 = at4.select(roundFsp($"ns", 2).as("ns"))
    assert(at2.select(MySqlCompat.mysql_duration_str($"ns", 2)).collect()
      .map(_.getString(0)).toSeq ===
      Seq("700:10:10.12", "-700:10:10.12"))
  }

  test("issue_8607: CAST(int AS CHAR(5)) truncates to the declared length") {
    val t = Seq(123456789).toDF("a")
    // MySQL CHAR(5) cast truncates; the compat lowering is substring
    val kept = t.where(substring($"a".cast("string"), 1, 5) === "12345")
    assert(kept.collect().map(_.getInt(0)).toSeq === Seq(123456789))
  }

  test("issue_8767: filter with self-referencing arithmetic on the filtered column") {
    val t = Seq(("^YSQT0]V@9TFN>^WB6G?NG@S8>VYOM;BSC@<BCQ6", -1881752L, 1986))
      .toDF("col1", "col2", "col3")
    val r = t.where($"col2" === -1881752L &&
      $"col2" * lit(-1881752L) =!= 8366212L).collect()
    assert(r.length === 1 && r(0).getLong(1) === -1881752L)
  }

  test("issue_8799: = ALL over a non-matching set makes the outer aggregate empty") {
    val t1 = Seq("aa").toDF("col1")
    val t2 = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l")
      .toDF("col1")
    t1.createOrReplaceTempView("i8799_t1")
    t2.createOrReplaceTempView("i8799_t2")
    // Spark has no `= ALL` syntax; TiDB's planner decomposes it before
    // pushdown (x = ALL(S) with non-null x, non-empty non-null S ⇔
    // NOT EXISTS(s ≠ x)) — mirror that decomposition
    val out = spark.sql(
      """SELECT count(distinct '20') FROM i8799_t1 t1
        |WHERE t1.col1 IS NOT NULL AND NOT EXISTS
        |  (SELECT 1 FROM i8799_t2 WHERE 'YmKS' != col1
        |   AND (col1 <> t1.col1 OR col1 IS NULL))"""
        .stripMargin).collect()
    assert(out.length === 1 && out(0).getLong(0) === 0L,
      "count(distinct const) over zero rows is 0")
  }

  test("issue_8811: NULL = SOME(correlated subquery) is never TRUE") {
    val t = Seq(1).toDF("a")
    t.createOrReplaceTempView("i8811_t")
    // Spark has no `= SOME` syntax; NULL = SOME(S) is UNKNOWN for any
    // S — the correlated scalar form preserves the subquery shape
    val out = spark.sql(
      """SELECT * FROM i8811_t t1
        |WHERE null = (SELECT first(a) FROM i8811_t t2 WHERE t1.a = t2.a)"""
        .stripMargin)
    assert(out.isEmpty, "NULL = SOME(non-empty) is UNKNOWN, filter drops the row")
  }

  test("issue_1796: constant-key GROUP BY MAX over +8:00-inserted timestamps") {
    // wall-clock strings inserted under +8:00 are instants 8h earlier
    val t = Seq(("2018-11-22 16:55:24", 1), ("2018-11-23 00:55:24", 1))
      .toDF("s", "b")
      .select(to_utc_timestamp($"s", "+08:00").as("a"), $"b")
    val out = t.groupBy(lit("a")).agg(max($"a").as("mx"))
      .select(date_format(from_utc_timestamp($"mx", "+08:00"),
        "yyyy-MM-dd HH:mm:ss"))
      .collect()
    assert(out.length === 1 && out(0).getString(0) === "2018-11-23 00:55:24")
  }
}
