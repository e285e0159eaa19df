package graft

import org.apache.spark.sql.functions._

/** Twenty-sixth tranche: the tidb-ci fullstack-test-dt pushdown suite
  * mirrored verbatim (`/root/reference/tests/tidb-ci/fullstack-test-dt/
  * {repeat_push_down, aggregation_push_down, distinct_agg_push_down,
  * duplicated_columns, union_push_down, projection_push_down}.test`):
  * aggregate-subquery joins (shuffle AND broadcast-forced variants must
  * agree), count(distinct) incl. the literal-NULL form, duplicated
  * group keys + duplicated output columns, a 3-branch UNION ALL joined
  * to a fact, and derived-column joins. */
class FullstackParitySpec26 extends SparkTestBase {
  import spark.implicits._

  private def t = Seq(
    (Option(1), Option("2.3")), (Option(3), Option("4.5")), (Option(5), Option("6.7")),
    (None, None), (Option(1), None), (None, Option("3.3")))
    .toDF("id", "v")
    .select($"id", $"v".cast("decimal(6,3)").as("value"))

  test("repeat_push_down.test: negative count → empty, NULLs propagate") {
    val f = Seq(
      (Option("abc"), Option(1)), (Option("pingcap"), Option(2)),
      (Option("li"), Option(-1)), (None, Option(4)), (Option("ww"), None))
      .toDF("a", "b")
    val got = f.select($"a", $"b",
        expr("repeat(a, b)").as("r"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(2)))).toSeq
    assert(got === Seq(
      (Some("abc"), Some("abc")),
      (Some("pingcap"), Some("pingcappingcap")),
      (Some("li"), Some("")),
      (None, None),
      (Some("ww"), None)))
  }

  test("aggregation_push_down.test: joins against aggregate subqueries, shuffle == broadcast") {
    t.createOrReplaceTempView("apd_t")
    def run(hint: String): Seq[Seq[Seq[String]]] = Seq(
      spark.sql(s"select t.id, t.value, A.c, A.id from apd_t t join " +
          s"(select $hint count(*) as c, id from apd_t group by id) as A on A.id = t.id " +
          "order by 1, 2, 3, 4")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq,
      spark.sql(s"select t.id, t.value, A.v from apd_t t join " +
          s"(select $hint count(*) as v, value, id from apd_t group by value, id " +
          "having value + v < 4) as A on A.id = t.id order by 1, 2, 3")
        .collect().map(_.toSeq.take(3).map(String.valueOf)).toSeq,
      spark.sql(s"select t.id, t.value, A.a from apd_t t join " +
          s"(select $hint count(*) - 1 as a from apd_t) as A on A.a = t.id " +
          "order by 1, 2, 3")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq,
      spark.sql("select sum(b) from (select t.id, t1.id as b from apd_t t " +
          "join apd_t t1 on t.id = t1.id) A group by id order by 1")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq)
    val shuffle = run("")
    assert(shuffle(0) === Seq(
      Seq("1", "null", "2", "1"), Seq("1", "2.300", "2", "1"),
      Seq("3", "4.500", "1", "3"), Seq("5", "6.700", "1", "5")))
    assert(shuffle(1) === Seq(Seq("1", "null", "1"), Seq("1", "2.300", "1")))
    assert(shuffle(2) === Seq(Seq("5", "6.700", "5")))
    assert(shuffle(3) === Seq(Seq("3"), Seq("4"), Seq("5")))
    // the broadcast-threshold-forced rerun of the transcript must agree
    val bcast = run("/*+ BROADCAST(A) */")
    assert(bcast === shuffle)
  }

  test("aggregation_push_down.test: grouped AVG under the MySQL scale rule + HAVING over the alias") {
    import graft.functions.MySqlCompat.mysql_div
    t.createOrReplaceTempView("apd_t")
    val avgs = t.groupBy($"id")
      .agg(mysql_div(sum($"value"), count($"value"), scaleA = 3).as("av"))
      .orderBy($"id".asc_nulls_first)
      .collect().map(r => (Option(r.get(0)).map(String.valueOf),
        Option(r.get(1)).map(String.valueOf))).toSeq
    // transcript includes id=4 from a later insert — add it
    val t4 = t.union(Seq((Option(4), Option.empty[String])).toDF("id", "v")
      .select($"id", $"v".cast("decimal(6,3)")))
    val avgs4 = t4.groupBy($"id")
      .agg(mysql_div(sum($"value"), count($"value"), scaleA = 3).as("av"))
      .orderBy($"id".asc_nulls_first)
      .collect().map(r => (Option(r.get(0)).map(String.valueOf),
        Option(r.get(1)).map(String.valueOf))).toSeq
    assert(avgs4 === Seq(
      (None, Some("3.3000000")), (Some("1"), Some("2.3000000")),
      (Some("3"), Some("4.5000000")), (Some("4"), None),
      (Some("5"), Some("6.7000000"))))
    // HAVING over the aggregate alias
    val having = t4.groupBy($"id")
      .agg(mysql_div(sum($"value"), count($"value"), scaleA = 3).as("av"))
      .where($"av" > 4 || $"id".isNull)
      .orderBy($"id".asc_nulls_first)
      .collect().map(r => Option(r.get(0)).map(String.valueOf)).toSeq
    assert(having === Seq(None, Some("3"), Some("5")))
    assert(avgs.nonEmpty)
  }

  test("distinct_agg_push_down.test: count(distinct) in subquery joins; count(distinct NULL) = 0") {
    val td = Seq(
      (Option(1), Option("2.3")), (Option(3), Option("4.5")), (Option(5), Option("6.7")),
      (Option(1), Option("4.5")), (None, None), (Option(1), None),
      (None, Option("3.3")), (None, Option("6.7")))
      .toDF("id", "v")
      .select($"id", $"v".cast("decimal(6,3)").as("value"))
    td.createOrReplaceTempView("dapd_t")
    val j = spark.sql(
      """select t.id, t.value, A.c from dapd_t t join
        |(select count(distinct(value)) as c, id from dapd_t group by id) as A
        |on A.id = t.id order by 1, 2, 3""".stripMargin)
      .collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(j === Seq(
      Seq("1", "null", "2"), Seq("1", "2.300", "2"), Seq("1", "4.500", "2"),
      Seq("3", "4.500", "1"), Seq("5", "6.700", "1")))
    val nulls = spark.sql(
      "select id, count(distinct(null)) c from dapd_t group by id order by 1, 2")
      .collect().map(r => (Option(r.get(0)).map(String.valueOf), r.getLong(1))).toSeq
    assert(nulls === Seq((None, 0L), (Some("1"), 0L), (Some("3"), 0L), (Some("5"), 0L)))
    val dv = spark.sql(
      "select id, count(distinct(value)) c from dapd_t group by id order by 1, 2")
      .collect().map(r => (Option(r.get(0)).map(String.valueOf), r.getLong(1))).toSeq
    assert(dv === Seq((None, 2L), (Some("1"), 2L), (Some("3"), 1L), (Some("5"), 1L)))
  }

  test("duplicated_columns.test: duplicate group keys and duplicate output columns") {
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      df.createOrReplaceTempView("dup_t")
      val m = spark.sql(
        "select col1, min(col2) mn, col1 from dup_t group by col1, col1")
        .collect()
        .map(r => (Option(r.get(0)).map(String.valueOf),
          Option(r.get(1)).map(String.valueOf), Option(r.get(2)).map(String.valueOf)))
        .toSet
      // the two col1 outputs agree on every row
      assert(m.forall(r => r._1 === r._3))
      m // keyed assertions below per table
    }
    val t1 = Seq(
      (Option(1), Option(1)), (Option(1), Option(2)), (Option(2), Option(2)),
      (Option(2), Option(3)), (Option(3), Option(3)), (Option(3), Option(4)),
      (Option(4), None), (None, Option(5)), (None, None))
      .toDF("col1", "col2")
    check(t1)
    val mins = spark.sql("select col1, min(col2) mn from dup_t group by col1, col1")
      .collect().map(r => (Option(r.get(0)).map(String.valueOf),
        Option(r.get(1)).map(String.valueOf))).toSet
    assert(mins === Set(
      (Some("4"), None), (None, Some("5")), (Some("2"), Some("2")),
      (Some("3"), Some("3")), (Some("1"), Some("1"))))
    val maxmin = spark.sql(
      "select max(col2) mx, min(col2) mn, col1 from dup_t group by col1, col1")
      .collect().map(r => (Option(r.get(0)).map(String.valueOf),
        Option(r.get(1)).map(String.valueOf), Option(r.get(2)).map(String.valueOf))).toSet
    assert(maxmin === Set(
      (Some("4"), Some("3"), Some("3")), (Some("2"), Some("1"), Some("1")),
      (Some("3"), Some("2"), Some("2")), (None, None, Some("4")),
      (Some("5"), Some("5"), None)))
    // decimal(21,0)/(22,0) keys — past double precision, exact grouping
    val t2 = Seq(
      (Option("1"), Option("1")), (Option("1"), Option("2")), (Option("2"), Option("2")),
      (Option("2"), Option("3")), (Option("3"), Option("3")), (Option("3"), Option("4")),
      (Option("4"), None), (None, Option("5")), (None, None),
      (Option("10"), Option("11")), (Option("10"), Option("12")))
      .toDF("c1", "c2")
      .select($"c1".cast("decimal(21,0)").as("col1"), $"c2".cast("decimal(22,0)").as("col2"))
    check(t2)
    val avg2 = spark.sql(
      "select col1, avg(col2 + 1) a, count(col2 + 1) c from dup_t group by col1, col1")
      .collect().map(r => (Option(r.get(0)).map(String.valueOf),
        Option(r.get(1)).map(v => f"${v.asInstanceOf[java.math.BigDecimal].doubleValue}%.4f"),
        r.getLong(2))).toSet
    assert(avg2 === Set(
      (Some("10"), Some("12.5000"), 2L), (Some("2"), Some("3.5000"), 2L),
      (Some("3"), Some("4.5000"), 2L), (Some("1"), Some("2.5000"), 2L),
      (Some("4"), None, 0L), (None, Some("6.0000"), 1L)))
  }

  test("union_push_down.test: 3-branch UNION ALL joined to the replicated fact") {
    val base = Seq((0, Option(0.0), 0.0), (1, Option(1.0), 1.0), (2, None, 2.0))
      .toDF("id", "d", "nd")
    val tt = (1 to 4).map(_ => base).reduce(_ union _) // tt = 4 copies of t
    val u = base.select($"d".as("DD"), $"nd".as("NDD"), $"id".as("IDD"))
      .unionAll(base.select($"d".as("DD"), lit(0.0).as("NDD"), $"id".as("IDD")))
      .unionAll(base.select($"d".as("DD"), $"nd".as("NDD"), lit(0).as("IDD")))
    val got = tt.join(u, tt("id") === u("IDD"))
      .select($"DD", $"NDD", $"IDD")
      .collect().map(r => (Option(r.get(0)).map(String.valueOf),
        r.getDouble(1), r.getInt(2))).toSeq
    // transcript: 9 distinct (DD, NDD, IDD) combinations × the 4 copies
    val expectedPerCopy = Seq(
      (Some("0.0"), 0.0, 0), (Some("0.0"), 0.0, 0), (Some("0.0"), 0.0, 0),
      (None, 2.0, 0), (Some("1.0"), 1.0, 0),
      (Some("1.0"), 1.0, 1), (Some("1.0"), 0.0, 1),
      (None, 2.0, 2), (None, 0.0, 2))
    assert(got.length === expectedPerCopy.length * 4)
    assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
      expectedPerCopy.groupBy(identity).view.mapValues(_.size * 4).toMap)
    // constant-branch unions
    val u2 = base.select(lit(127).as("IDD")).unionAll(base.select($"id".as("IDD")))
    assert(tt.join(u2, tt("id") === u2("IDD")).count() === 12L)
    val u3 = base.select(lit(127).as("IDD")).unionAll(base.select(lit(1).as("IDD")))
    val g3 = tt.join(u3, tt("id") === u3("IDD")).select($"IDD")
      .collect().map(_.getInt(0)).toSeq
    assert(g3.length === 12 && g3.forall(_ === 1))
  }

  test("projection_push_down.test: arithmetic projections and derived-column joins") {
    t.createOrReplaceTempView("ppd_t")
    val proj = spark.sql(
      "select id + 1 a, value + 1 b from ppd_t order by id")
      .collect().map(r => (Option(r.get(0)).map(String.valueOf),
        Option(r.get(1)).map(String.valueOf))).toSeq
    assert(proj.toSet === Set(
      (None, None), (None, Some("4.300")), (Some("2"), Some("3.300")),
      (Some("2"), None), (Some("4"), Some("5.500")), (Some("6"), Some("7.700")))
      && proj.length === 6)
    assert(spark.sql("select count(a) from (select id + 1 as a from ppd_t) A")
      .collect().head.getLong(0) === 4L)
    val jb = spark.sql(
      "select A.b from ppd_t t join (select id - 2 as b from ppd_t) A on A.b = t.id")
      .collect().map(_.getInt(0)).toSeq.sorted
    assert(jb === Seq(1, 1, 3))
    assert(spark.sql("select sum(b) from (select id + 1 as b from ppd_t) A")
      .collect().head.getLong(0) === 14L)
  }
}
