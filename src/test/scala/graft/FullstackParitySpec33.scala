package graft

import org.apache.spark.sql.functions._

/** Thirty-third tranche: timestamp/timezone + collation-sensitive
  * aggregation fixtures mirrored
  * (`/root/reference/tests/fullstack-test/expr/year-month-day.test`,
  * `fullstack-test/expr/unixTimeStamp.test`,
  * `tidb-ci/fullstack-test-dt/timestamp_with_timezone.test`,
  * `tidb-ci/new_collation_fullstack/count_distinct.test`,
  * `tidb-ci/new_collation_fullstack/sort_constant_column.test`).
  *
  * TiDB semantics under test: TIMESTAMP stores an instant and renders
  * in the session time_zone, while DATETIME/DATE are wall-clock and
  * time_zone-independent; MySQL PAD SPACE + case-insensitive collation
  * changes DISTINCT cardinality; ORDER BY a constant-null expression
  * must be a no-op reorder. Spark mapping: TIMESTAMP ≙ TimestampType
  * (instant) rendered via from_utc_timestamp / session zone, DATETIME
  * ≙ TimestampNTZType, collation via collate(UTF8_LCASE) + rtrim for
  * PAD SPACE.
  */
class FullstackParitySpec33 extends SparkTestBase {
  import spark.implicits._

  private def ci(c: org.apache.spark.sql.Column) =
    expr(s"collate(rtrim(${c.toString}), 'UTF8_LCASE')")

  test("year-month-day.test: datetime/date are tz-invariant, timestamp shifts with session tz") {
    // rows stored at UTC instants; 'c' is the TIMESTAMP column
    val t = Seq(
      ("2020-01-01 00:00:01", "2020-01-01", "2020-01-01 00:00:01"),
      ("2021-12-31 23:59:59", "2021-12-31", "2021-12-31 23:59:59"),
      (null, null, null))
      .toDF("a_s", "b_s", "c_s")
      .select($"a_s".cast("timestamp_ntz").as("a"), $"b_s".cast("date").as("b"),
        to_utc_timestamp($"c_s", "UTC").as("c"))

    def ymd(tz: String) = t.select(
      year($"a").as("ya"), month($"a").as("ma"), dayofmonth($"a").as("da"),
      year($"b").as("yb"), month($"b").as("mb"), dayofmonth($"b").as("db"),
      year(from_utc_timestamp($"c", tz)).as("yc"),
      month(from_utc_timestamp($"c", tz)).as("mc"),
      dayofmonth(from_utc_timestamp($"c", tz)).as("dc"))
      .collect().map(r => (0 until 9).map(i =>
        if (r.isNullAt(i)) null else r.getInt(i)).toList).toSet

    // +1:00 — the 23:59:59 timestamp rolls into 2022-01-01
    assert(ymd("+01:00") === Set(
      List(2020, 1, 1, 2020, 1, 1, 2020, 1, 1),
      List(2021, 12, 31, 2021, 12, 31, 2022, 1, 1),
      List(null, null, null, null, null, null, null, null, null)))
    // -1:00 — the 00:00:01 timestamp rolls back to 2019-12-31
    assert(ymd("-01:00") === Set(
      List(2020, 1, 1, 2020, 1, 1, 2019, 12, 31),
      List(2021, 12, 31, 2021, 12, 31, 2021, 12, 31),
      List(null, null, null, null, null, null, null, null, null)))
    // filter legs of the fixture
    val cm1 = t.select(from_utc_timestamp($"c", "-01:00").as("c1"))
    assert(cm1.where(year($"c1") === 2019).count() === 1L)
    assert(cm1.where(month($"c1") === 12).count() === 2L)
    assert(cm1.where(dayofmonth($"c1") === 31).count() === 2L)
    val cp1 = t.select(from_utc_timestamp($"c", "+01:00").as("c1"))
    assert(cp1.where(year($"c1") === 2022).count() === 1L)
    assert(cp1.where(month($"c1").isNull).count() === 1L)
    assert(cp1.where(dayofmonth($"c1") === 1).count() === 2L)
  }

  test("unixTimeStamp.test: date shifts with tz, timestamp(3)/(6) epoch is tz-invariant") {
    // the three inserted rows; micros preserve the fsp-6 fraction,
    // millis the fsp-3 rounding of .191981 → .192
    val rows = Seq(
      ("2021-05-23", "2021-05-23 11:45:14", 1621770314000L, 1621770314000000L),
      ("2021-05-23", "2021-05-23 11:45:14", 1621770314192L, 1621770314192000L),
      ("2021-05-23", "2021-05-23 11:45:14", 1621770314192L, 1621770314191981L))
      .toDF("a_s", "b_s", "c_ms", "d_us")
      .select($"a_s".cast("date").as("a"), $"b_s".as("b"),
        timestamp_millis($"c_ms").as("c"), timestamp_micros($"d_us").as("d"))

    // UTC session: date → midnight epoch, datetime string → epoch
    val utc = rows.select(
      unix_timestamp($"a").as("ua"),
      unix_timestamp($"b", "yyyy-MM-dd HH:mm:ss").as("ub"),
      unix_micros($"c").as("uc"), unix_micros($"d").as("ud"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(utc.forall(_._1 == 1621728000L), "date at UTC midnight")
    assert(utc.forall(_._2 == 1621770314L))
    assert(utc.map(_._3).toSet === Set(1621770314000000L, 1621770314192000L))
    assert(utc.map(_._4).toSet ===
      Set(1621770314000000L, 1621770314192000L, 1621770314191981L))

    // +1:00 session: DATE/DATETIME are wall-clock → epoch shifts back
    // 3600 s; the TIMESTAMP columns are instants → epoch unchanged
    val shifted = rows.select(
      unix_timestamp(to_utc_timestamp($"a".cast("timestamp_ntz"), "+01:00")).as("ua"),
      unix_timestamp(to_utc_timestamp($"b".cast("timestamp_ntz"), "+01:00")).as("ub"),
      unix_micros($"c").as("uc"))
      .collect()
    assert(shifted.forall(_.getLong(0) == 1621724400L))
    assert(shifted.forall(_.getLong(1) == 1621766714L))
    assert(shifted.map(_.getLong(2)).toSet ===
      Set(1621770314000000L, 1621770314192000L))
  }

  test("timestamp_with_timezone.test: instants inserted in different zones compare equal") {
    // t1 inserted at America/New_York wall clock, t2 the same instants
    // at Asia/Shanghai wall clock
    val t1 = Seq((1, "2020-01-01 11:11:11"), (2, "2020-01-02 16:11:11"))
      .toDF("id", "s")
      .select($"id", to_utc_timestamp($"s", "America/New_York").as("value"))
    val t2 = Seq((1, "2020-01-02 00:11:11"), (2, "2020-01-03 05:11:11"))
      .toDF("id", "s")
      .select($"id", to_utc_timestamp($"s", "Asia/Shanghai").as("value"))

    // same instants → equijoin matches both rows
    assert(t1.join(t2, Seq("id", "value")).count() === 2L)
    // Shanghai rendering of t1.value finds id=2 at '2020-01-03 05:11:11'
    val sh = t1.where(from_utc_timestamp($"value", "Asia/Shanghai") ===
      lit("2020-01-03 05:11:11").cast("timestamp_ntz"))
    assert(sh.select($"id").collect().map(_.getInt(0)).toSeq === Seq(2))
    // UTC rendering finds id=1 at '2020-01-01 16:11:11', and grouping
    // by the rendered value keeps count 1
    val utcq = t1.where(from_utc_timestamp($"value", "UTC") ===
      lit("2020-01-01 16:11:11").cast("timestamp_ntz"))
    assert(utcq.count() === 1L &&
      utcq.select($"id").head().getInt(0) === 1)
    val grouped = t1
      .groupBy(from_utc_timestamp($"value", "UTC").as("v"))
      .agg(count(lit(1)).as("n"))
      .where($"v" === lit("2020-01-01 16:11:11").cast("timestamp_ntz"))
    assert(grouped.select($"n").head().getLong(0) === 1L)
  }

  test("count_distinct.test: PAD-SPACE ci vs bin collation distinct cardinalities") {
    val tx = Seq((1, "a", "a"), (2, "A ", "a "), (3, "A", "A"), (4, "a ", "A "))
      .toDF("a", "b", "c")
    // utf8mb4_general_ci: 'a' = 'A ' = 'A' = 'a ' → 1
    assert(tx.select(countDistinct(ci($"b"))).head().getLong(0) === 1L)
    // utf8mb4_bin is PAD SPACE too: 'a'='a ', 'A'='A ' → 2
    assert(tx.select(countDistinct(rtrim($"c"))).head().getLong(0) === 2L)
    // pairs (b ci, c bin): (a,a),(a,a),(a,A),(a,A) → 2
    assert(tx.select(countDistinct(ci($"b"), rtrim($"c"))).head().getLong(0) === 2L)
    // a < 3: (a,a),(a,a) → 1
    assert(tx.where($"a" < 3)
      .select(countDistinct(rtrim($"c"), ci($"b"))).head().getLong(0) === 1L)
    // approx_count_distinct sees the same normalized keys
    assert(tx.select(approx_count_distinct(ci($"b"))).head().getLong(0) === 1L)
    assert(tx.select(approx_count_distinct(struct(rtrim($"c"), ci($"b"))))
      .head().getLong(0) === 2L)
    assert(tx.where($"a" < 3)
      .select(approx_count_distinct(struct(ci($"b"), rtrim($"c"))))
      .head().getLong(0) === 1L)
  }

  test("sort_constant_column.test: ORDER BY concat(value, null) is constant-null stable") {
    val t = Seq((1, "abc", "abc "), (2, "Abc", "abc"), (3, "def", "def "))
      .toDF("id", "value", "value1")
    // concat with NULL is NULL for every row — the sort must keep all
    // rows and impose no filtering
    val out = t.orderBy(concat($"value", lit(null).cast("string"))).limit(10)
    assert(out.count() === 3L)
    assert(out.select($"id").collect().map(_.getInt(0)).toSet === Set(1, 2, 3))
  }
}
