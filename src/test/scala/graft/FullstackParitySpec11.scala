package graft

import org.apache.spark.sql.functions._

/** Eleventh tranche — regression fixtures from the reference's
  * `tests/fullstack-test/issues/` mirrored verbatim: NULL propagation
  * through keyless aggregates over empty input into nested IN
  * subqueries (issue_3373), `= ALL` against a non-matching set feeding
  * count(distinct const) (issue_8799, via the NOT EXISTS rewrite since
  * Spark has no quantified comparisons), `NULL = SOME(correlated)`
  * three-valued filtering (issue_8811, via IN), and MySQL's truncating
  * CAST(int AS CHAR(5)) in a predicate (issue_8607). */
class FullstackParitySpec11 extends SparkTestBase {
  import spark.implicits._

  test("issue_3373: empty-input sum through HAVING + nested NOT IN keeps the NULL row") {
    // t empty, t2 empty — sum(a) over empty input is one NULL row;
    // NOT IN over an empty subquery is TRUE, so the NULL row survives
    val t = Seq.empty[Int].toDF("a")
    val t2 = Seq.empty[(Double, Float)].toDF("a", "b")
    t.createOrReplaceTempView("i3373_t")
    t2.createOrReplaceTempView("i3373_t2")
    val rows = spark.sql(
      """select x from (select sum(a) as x from i3373_t) s
        |where x not in (select b from i3373_t2 where s.x in (b))""".stripMargin)
      .collect()
    assert(rows.length === 1 && rows.head.isNullAt(0))
  }

  test("issue_8799: col = ALL(non-matching set) is false, count(distinct const) over empty is 0") {
    val t1 = Seq("aa").toDF("col1")
    val t2 = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l")
      .toDF("col1")
    t1.createOrReplaceTempView("i8799_t1")
    t2.createOrReplaceTempView("i8799_t2")
    // 'aa' = ALL(12 single-letter values) → false → zero input rows →
    // count(distinct '20') = 0 (one row, not empty: keyless aggregate).
    // Spark's parser has no quantified comparison, so we apply the
    // standard rewrite x = ALL(S) ≡ NOT EXISTS(v ∈ S: x <> v) — exact
    // here because the fixture is null-free.
    val rows = spark.sql(
      """select count(distinct '20') from i8799_t1
        |where not exists(select 1 from i8799_t2
        |                 where 'YmKS' != col1 and i8799_t1.col1 != col1)""".stripMargin)
      .collect()
    assert(rows.length === 1 && rows.head.getLong(0) === 0L)
  }

  test("issue_8811: NULL = SOME(correlated non-empty) filters the row (three-valued)") {
    val t = Seq(1).toDF("a")
    t.createOrReplaceTempView("i8811_t")
    // the correlated subquery matches (a=1), but NULL = 1 is UNKNOWN →
    // the WHERE rejects the row → empty result. x = SOME(S) ≡ x IN S,
    // which Spark's parser does accept.
    val rows = spark.sql(
      """select * from i8811_t t1
        |where cast(null as int) in (select a from i8811_t t2 where t1.a = t2.a)""".stripMargin)
      .collect()
    assert(rows.isEmpty)
  }

  test("issue_8607: CAST(int AS CHAR(5)) truncates before the comparison") {
    // MySQL CHAR(5) cast keeps the first 5 characters: 123456789 →
    // '12345' → the predicate MATCHES the full row
    val t = Seq(123456789).toDF("a")
    val rows = t.where(substring($"a".cast("string"), 1, 5) === "12345")
      .as[Int].collect()
    assert(rows.toSeq === Seq(123456789))
    // and a non-truncating cast would NOT match — the truncation is
    // the semantics under test
    assert(t.where($"a".cast("string") === "12345").count() === 0)
  }
}
