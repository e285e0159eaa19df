package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forty-fourth tranche — the shuffle-key SEMANTICS fixtures left in
  * delta-merge-test/query/mpp:
  *
  *  - `enum_mpp.test`: Enum16 as aggregation and join shuffle key —
  *    grouping happens on the enum VALUE (its label), the golden
  *    counts and 8-row join hold under both shuffle and broadcast
  *    plans. Enums ride the repo's (code, label) convention (q47b).
  *  - `collator_mpp.test`: utf8mb4_general_ci (collator -45) vs
  *    binary (-46) drives selection, aggregation, and join: ci
  *    selection keeps all case variants, ci group-by merges them
  *    (counts 2/3/4 with the NULL group intact), the ci join produces
  *    the full 21-row cross-case golden, and the SAME query under the
  *    binary collator keeps cases apart.
  *  - `exchange_with_timestamp_col.test`: timestamp(5) + bit(1) as
  *    shuffle keys with a +08:00 session-tz rendering — grouping
  *    happens on the INSTANT (tz-invariant), display shifts by
  *    tz_offset 28800, fsp-5 formatting keeps 5 fractional digits.
  */
class FullstackParitySpec44 extends SparkTestBase {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(r => (0 until r.length).map(j =>
      if (r.isNullAt(j)) "N" else r.get(j).toString).mkString(",")).toSeq.sorted

  private val enumLabels = Map(1 -> "male", 2 -> "female", 3 -> "both", 4 -> "unknown")
  private lazy val e1 = Seq((1L, 1), (2L, 2), (3L, 1), (4L, 2), (5L, 3))
    .toDF("col_1", "code")
    .withColumn("col_2", expr(
      "CASE code WHEN 1 THEN 'male' WHEN 2 THEN 'female' WHEN 3 THEN 'both' ELSE 'unknown' END"))
  private lazy val e2 = Seq((1L, 1), (2L, 2), (3L, 1), (4L, 2))
    .toDF("col_1", "code")
    .withColumn("col_2", expr(
      "CASE code WHEN 1 THEN 'male' WHEN 2 THEN 'female' WHEN 3 THEN 'both' ELSE 'unknown' END"))

  test("enum_mpp.test: Enum16 as aggregation shuffle key groups by label") {
    val got = canon(e1.groupBy(col("col_2"))
      .agg(count(col("col_1")).as("c")).select(col("c"), col("col_2")))
    assert(got === Seq("1,both", "2,female", "2,male"))
  }

  test("enum_mpp.test: Enum16 as join key — shuffle and broadcast agree on the 8-row golden") {
    val exp = Seq(
      "2,female,4,female", "2,female,2,female", "4,female,4,female",
      "4,female,2,female", "1,male,1,male", "1,male,3,male",
      "3,male,1,male", "3,male,3,male").sorted
    val sh = canon(e1.hint("shuffle_hash").join(e2, "col_2")
      .select(e1("col_1"), col("col_2"), e2("col_1"), col("col_2")))
    val bc = canon(e1.join(broadcast(e2), "col_2")
      .select(e1("col_1"), col("col_2"), e2("col_1"), col("col_2")))
    assert(sh === exp)
    assert(bc === exp)
  }

  private lazy val c1 = Seq(
    ("Test3", 777L, "Test3"), ("Test4", 888L, "Test4"),
    ("test3", 777L, "test3"), ("test4", 888L, "test4"),
    ("Test3", 777L, "Test3"), ("Test4", 888L, "Test4"),
    ("test4", 999L, "test4"), ("xxx", 911L, null), ("xxx", 922L, null))
    .toDF("col_1", "col_2", "col_3")
  private lazy val c2 = Seq(
    ("Test3", 777L, "Test3"), ("Test4", 888L, "Test4"),
    ("test3", 777L, "test3"), ("test4", 888L, "test4"),
    ("Test3", 777L, "Test3"), ("Test4", 888L, "Test4"))
    .toDF("col_1", "col_2", "col_3")

  test("collator_mpp.test: ci selection keeps case variants, binary keeps one") {
    val ci = canon(c1.filter(lower(col("col_1")) === "test3")
      .select(col("col_1"), col("col_2")))
    assert(ci === Seq("Test3,777", "Test3,777", "test3,777"))
    val bin = canon(c1.filter(col("col_1") === "test3")
      .select(col("col_1"), col("col_2")))
    assert(bin === Seq("test3,777"))
  }

  test("collator_mpp.test: ci group-by merges case classes and keeps the NULL group") {
    val byCol1 = canon(c1.groupBy(lower(col("col_1")).as("k"))
      .agg(count(lit(1)).as("c")).select(col("c")))
    assert(byCol1 === Seq("2", "3", "4"),
      "xxx=2, test3-class=3, test4-class=4 under ci")
    val byCol3 = canon(c1.groupBy(lower(col("col_3")).as("k"))
      .agg(count(lit(1)).as("c")).select(col("c")))
    assert(byCol3 === Seq("2", "3", "4"),
      "NULLs form one group of 2; ci merges the case classes")
  }

  test("collator_mpp.test: ci shuffle join produces the 21-row cross-case golden") {
    val j = c1.join(c2, lower(c1("col_1")) === lower(c2("col_1")))
      .select(c1("col_1"), c1("col_2"), c1("col_3"),
        c2("col_1"), c2("col_2"), c2("col_3"))
    val got = canon(j)
    assert(got.length === 21, "3x3 test3-class + (4 probe x 3 build) test4-class")
    // every test4-class probe row (incl. the 999 one) matches all 3 builds
    assert(got.count(_.startsWith("test4,999")) === 3)
    // binary join keeps cases apart: only exact-case pairs survive
    val bin = c1.join(c2, c1("col_1") === c2("col_1"))
    assert(bin.count() === 11,
      "Test3 2x2 + Test4 2x2 + test3 1x1 + test4 2x1 exact-case pairs")
  }

  test("exchange_with_timestamp_col.test: timestamp(5) shuffle key groups on the instant; +08:00 renders shifted") {
    val t1 = Seq(
      (1, "2020-01-01 00:00:00"), (0, "2021-01-02 11:11:11.11111"),
      (1, "2021-01-01 00:00:00"), (0, "2021-01-02 11:11:11.11111"),
      (1, "2020-01-01 00:00:00"), (0, "2021-01-01 00:00:00"))
      .toDF("b", "s").withColumn("ts", col("s").cast("timestamp"))
    val grouped = t1.groupBy(col("b"), col("ts")).agg(count(lit(1)).as("c"))
    assert(grouped.count() === 4L, "4 distinct (bit, instant) groups")
    val rendered = canon(grouped.select(col("b"),
      date_format(from_utc_timestamp(col("ts"), "+08:00"),
        "yyyy-MM-dd HH:mm:ss.SSSSS").as("r")))
    assert(rendered === Seq(
      "0,2021-01-01 08:00:00.00000", "0,2021-01-02 19:11:11.11111",
      "1,2020-01-01 08:00:00.00000", "1,2021-01-01 08:00:00.00000"))
    // join on the timestamp key: shuffle and broadcast agree
    val t2 = Seq(
      (1, "2021-01-01 00:00:00"), (0, "2021-01-02 11:11:11.11111"),
      (1, "2020-01-01 00:00:00"), (1, "2021-01-01 00:00:00"),
      (1, "2020-01-01 00:00:00"), (0, "2020-01-02 11:11:11.11111"))
      .toDF("b2", "s2").withColumn("ts", col("s2").cast("timestamp"))
    val sh = canon(t1.hint("shuffle_hash").join(t2, "ts")
      .select(col("b"), col("b2")))
    val bc = canon(t1.join(broadcast(t2), "ts").select(col("b"), col("b2")))
    assert(sh === bc && sh.nonEmpty,
      "timestamp join keys hash identically under both plans")
  }
}
