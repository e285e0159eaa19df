package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.MySqlCompat

/** Forty-third tranche — the remaining delta-merge MPP fixtures: the
  * exchange/shuffle semantics suite that pins result-equivalence
  * across partitioning strategies (TiFlash's ExchangeSender hash vs
  * broadcast ≙ Spark's shuffle vs broadcast join, chosen by
  * hint/AQE — the RESULT must be partitioning-invariant):
  *
  *  - `delta-merge-test/query/mpp/aggregation_mpp.test`: shuffle agg
  *    over an EMPTY 3-region table (zero groups, not a zero row),
  *    then the 12-row golden counts, stable across partition counts.
  *  - `delta-merge-test/query/mpp/join_mpp.test`: inner shuffle join
  *    == broadcast join == duplicate-key `using col_2,col_2` join
  *    (all 18 golden rows); left join null-extends the unmatched
  *    (test4, 999) build row.
  *  - `delta-merge-test/query/mpp/partition_exchange.test`: group-by
  *    shuffle keys of every exchangeable dtype (signed/unsigned ints,
  *    decimals at 5/10/30/38 precision, date, datetime(3), string
  *    with '' vs non-empty) hash consistently — identical groups at
  *    any partition count; signed key -1/0/1 vs its unsigned
  *    reinterpretation groups differently (3+3+3 vs 6+3).
  *  - `delta-merge-test/query/mpp/duration_mpp.test`: Duration
  *    (Int64-nanos TIME) as a SHUFFLE KEY at the ±838:59:59 domain
  *    boundary — group-by and join keys agree between shuffle and
  *    broadcast plans, renderings pinned via mysql_duration_str.
  *  - `fullstack-test/issues/issue_7519.test`: dynamic partition
  *    pruning over a range-partitioned table (16385 rows, partition
  *    p1 holds ONE row) — the x-range filter must prune at the scan,
  *    and the survivor's >100-hour TIME renders 500:21:21 with
  *    hour() = 500.
  */
class FullstackParitySpec43 extends SparkTestBase {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(r => (0 until r.length).map(j =>
      if (r.isNullAt(j)) "N" else r.get(j).toString).mkString(",")).toSeq.sorted

  // 3 regions x 4 rows, as inserted by the fixture
  private lazy val aggT = Seq(
    ("test1", 666L), ("test2", 666L), ("test3", 777L), ("test4", 888L),
    ("test1", 666L), ("test2", 666L), ("test3", 777L), ("test4", 888L),
    ("test1", 666L), ("test2", 666L), ("test3", 777L), ("test4", 888L))
    .toDF("col_1", "col_2")

  test("aggregation_mpp.test: shuffle agg over an empty table yields zero groups") {
    val empty = aggT.filter(lit(false))
    assert(empty.groupBy(col("col_2")).agg(count(col("col_1"))).count() === 0L,
      "group-by over empty input produces no groups (not a 0-count row)")
  }

  test("aggregation_mpp.test: 3-region golden counts, invariant to partition count") {
    val exp = Seq("6,666", "3,777", "3,888")
    Seq(1, 3, 7).foreach { p =>
      val got = canon(aggT.repartition(p)
        .groupBy(col("col_2")).agg(count(col("col_1")).as("c"))
        .select(col("c"), col("col_2")))
      assert(got === exp.sorted, s"at $p partitions")
    }
  }

  private lazy val j1 = Seq(
    ("test3", 777L), ("test4", 888L), ("test3", 777L), ("test4", 888L),
    ("test3", 777L), ("test4", 888L), ("test4", 999L)).toDF("a1", "col_2")
  private lazy val j2 = Seq(
    ("test13", 777L), ("test14", 888L), ("test13", 777L), ("test14", 888L),
    ("test13", 777L), ("test14", 888L)).toDF("a2", "col_2")

  test("join_mpp.test: shuffle == broadcast == duplicate-condition inner join (18 golden rows)") {
    val exp = (Seq.fill(9)("test3,777,test13,777") ++
      Seq.fill(9)("test4,888,test14,888")).sorted
    val shuffled = j1.hint("shuffle_hash").join(j2, "col_2")
      .select(col("a1"), col("col_2"), col("a2"), col("col_2"))
    val bcast = j1.join(broadcast(j2), "col_2")
      .select(col("a1"), col("col_2"), col("a2"), col("col_2"))
    // `using col_2,col_2` — the repeated equi-condition collapses
    val dup = j1.join(j2, Seq("col_2", "col_2"))
      .select(col("a1"), col("col_2"), col("a2"), col("col_2"))
    assert(canon(shuffled) === exp)
    assert(canon(bcast) === exp)
    assert(canon(dup) === exp)
  }

  test("join_mpp.test: left join null-extends the unmatched 999 row") {
    val got = canon(j1.join(j2, Seq("col_2"), "left")
      .select(col("a1"), col("col_2"), col("a2")))
    assert(got.count(_ == "test4,999,N") === 1)
    assert(got.length === 19)
  }

  test("partition_exchange.test: every shuffle-key dtype groups identically at any partition count") {
    val rows = Seq.fill(3)(Seq(
      (1, 1, 1L, "1.11", "2020-01-01", "2020-01-01 00:00:00.000", "111"),
      (0, 0, 0L, "0.00", "2020-01-01", "2020-01-01 00:00:00.000", ""),
      (-1, 1, -1L, "-1.11", "2020-01-01", "2020-01-01 00:00:00.000", "111")))
      .flatten.toDF("i8", "u8", "i64", "dec", "d", "ts", "s")
      .withColumn("dec5", col("dec").cast("decimal(5,2)"))
      .withColumn("dec30", col("dec").cast("decimal(30,2)"))
      .withColumn("dec38", col("dec").cast("decimal(38,2)"))
      .withColumn("dt", col("d").cast("date"))
      .withColumn("ts3", col("ts").cast("timestamp"))
    def groups(key: String, p: Int): Seq[String] =
      canon(rows.repartition(p).groupBy(col(key))
        .agg(count(lit(1)).as("c")).select(col("c"), col(key)))
    for (key <- Seq("i8", "u8", "i64", "dec5", "dec30", "dec38", "dt", "ts3", "s"))
      assert(groups(key, 1) === groups(key, 3) && groups(key, 3) === groups(key, 7),
        s"shuffle key $key must hash consistently")
    // the signed vs unsigned reinterpretation splits differently
    assert(groups("i8", 3) === Seq("3,-1", "3,0", "3,1"))
    assert(groups("u8", 3) === Seq("3,0", "6,1"))
    assert(groups("s", 3) === Seq("3,", "6,111"),
      "empty string is a distinct group from '111'")
  }

  // Duration fixture values (Int64 nanos): ±1µs, 0, ±838:59:59, ±800:10:10.123460
  private val durNanos = Seq(-1000L, 0L, 1000L, 3020399000000000L,
    -3020399000000000L, -2880610123460000L, 2880610123460000L)

  test("duration_mpp.test: duration is a valid shuffle/join key at the ±838:59:59 boundary") {
    val t1 = durNanos.toDF("ns")
    val t2 = durNanos.toDF("ns")
    val shuffled = t1.hint("shuffle_hash").join(t2, "ns")
      .select(MySqlCompat.mysql_duration_str(col("ns"), 6).as("r"))
    val bcast = t1.join(broadcast(t2), "ns")
      .select(MySqlCompat.mysql_duration_str(col("ns"), 6).as("r"))
    val exp = Seq("-00:00:00.000001", "00:00:00.000000", "00:00:00.000001",
      "838:59:59.000000", "-838:59:59.000000",
      "-800:10:10.123460", "800:10:10.123460").sorted
    assert(canon(shuffled) === exp, "each key joins exactly itself")
    assert(canon(bcast) === exp, "broadcast plan agrees with shuffle plan")
    val grouped = canon(t1.groupBy(col("ns")).agg(count(lit(1)).as("c"))
      .select(MySqlCompat.mysql_duration_str(col("ns"), 6).as("r")))
    assert(grouped === exp, "group-by on the duration key keeps all 7 groups")
  }

  test("issue_7519.test: range-partition pruning + >100h TIME survives with hour()=500") {
    // (x, a, y, t): 2 rows doubled 13x = 16384 in p0, +1 row in p1
    val big = (1 to 8192).flatMap(_ => Seq(
      (1, "a", 1, 2520671123400000L), (2, "b", 2, 2560332123400000L)))
    val all = (big :+ ((8, "c", 8, 1801281123400000L)))
      .toDF("x", "a", "y", "tns")
      .withColumn("part", when(col("x") < 5, "p0").otherwise("p1"))
    val dir = java.nio.file.Files.createTempDirectory("issue7519").toString
    all.write.partitionBy("part").mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    assert(t.count() === 16385L, "fixture row count")
    val q = t.filter(col("x") >= 5 && col("x") < 10)
    val survivors = q.select(col("x"), col("a"), col("y"),
      MySqlCompat.mysql_duration_str(col("tns"), 0).as("t"),
      (col("tns") / 3600000000000L).cast("long").as("h"))
    assert(canon(survivors) === Seq("8,c,8,500:21:21,500"),
      "only p1's row survives; 500-hour TIME does not wrap at 24h")
    // pruning: the x predicate implies part = 'p1' — assert the scan
    // reads a single partition directory when filtered on part
    val pruned = t.filter(col("part") === "p1")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("part#"),
      "partition column filter must reach the scan as a PartitionFilter")
    def filesRead(df: DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numFiles").map(_.value)).sum
    }
    val prunedFiles = filesRead(pruned)
    val allFiles = filesRead(t.filter(col("part").isNotNull))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned scan must touch strictly fewer files ($prunedFiles < $allFiles)")
  }
}
