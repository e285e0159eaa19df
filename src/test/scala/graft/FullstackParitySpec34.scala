package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Thirty-fourth tranche: the broadcast-join fullstack suite mirrored
  * (`/root/reference/tests/tidb-ci/fullstack-test-dt/broadcast_join
  * .test`, `tidb-ci/fullstack-test-dt/mpp_join.test`): every join kind
  * under an explicitly broadcast build side — inner/left/right with
  * null keys, ON-clause one-sided ("left condition") and cross-side
  * ("other condition") predicates, EXISTS/NOT-EXISTS with correlated
  * inequality conditions, NOT NULL key tables, mismatched DECIMAL key
  * widths, and derived-table equi-joins. The reference routes these
  * through its broadcast exchange writer
  * (`dbms/src/Flash/Mpp/BroadcastOrPassThroughWriter.cpp`); Spark's
  * `broadcast()` hint + BroadcastHashJoinExec is the same plan shape.
  */
class FullstackParitySpec34 extends SparkTestBase {
  import spark.implicits._

  private def t1 = Seq[(Integer, Integer)](
    (1, 2), (3, 4), (3, 5), (3, 6), (5, 6), (7, 8), (9, 10),
    (null, 11), (null, 12), (10, null), (null, null)).toDF("id", "value")
  private def t2 = Seq[(Integer, Integer)](
    (3, 4), (5, 6), (5, 7), (5, 8), (null, 7), (null, 8)).toDF("id", "value")

  private def rows4(df: DataFrame): Set[(Any, Any, Any, Any)] = {
    // multiset-as-counted-set so duplicate rows are compared exactly
    val m = df.collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3)))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, k._3, s"${k._4}#${v.length}") }
    m.toSet
  }

  private def hasBhj(df: DataFrame): Boolean = {
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin")
  }

  test("broadcast_join.test: inner join over nullable keys drops all null keys") {
    val j = t1.as("a").join(broadcast(t2.as("b")), $"a.id" === $"b.id")
    assert(hasBhj(j), "hint must produce a broadcast join")
    val got = j.select($"a.id", $"a.value", $"b.id", $"b.value").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).sorted.toSeq
    assert(got === Seq(
      (3, 4, 3, 4), (3, 5, 3, 4), (3, 6, 3, 4),
      (5, 6, 5, 6), (5, 6, 5, 7), (5, 6, 5, 8)))
  }

  test("broadcast_join.test: inner with other condition t1.value > t2.value") {
    val j = t2.as("b").join(broadcast(t1.as("a")),
      $"b.id" === $"a.id" && $"a.value" > $"b.value")
      .select($"a.id", $"a.value", $"b.id", $"b.value")
    val got = j.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).sorted.toSeq
    assert(got === Seq((3, 5, 3, 4), (3, 6, 3, 4)))
  }

  test("broadcast_join.test: left join null-extends unmatched and null-key rows") {
    val j = t1.as("a").join(broadcast(t2.as("b")), $"a.id" === $"b.id", "left")
      .select($"a.id", $"a.value", $"b.id", $"b.value")
    assert(j.count() === 13L)
    // unmatched left rows appear exactly once, null-extended
    val unmatched = j.where($"b.id".isNull)
      .collect().map(r => (r.get(0), r.get(1))).toSet
    assert(unmatched === Set((1, 2), (7, 8), (9, 10), (null, 11), (null, 12),
      (10, null), (null, null)))
  }

  test("broadcast_join.test: left join with LEFT-side ON condition t2.value > 5") {
    val j = t2.as("b").join(broadcast(t1.as("a")),
        $"b.id" === $"a.id" && $"b.value" > 5, "left")
      .select($"a.id", $"a.value", $"b.id", $"b.value")
    assert(rows4(j) === rows4(Seq[(Integer, Integer, Integer, Integer)](
      (5, 6, 5, 8), (5, 6, 5, 7), (5, 6, 5, 6),
      (null, null, 3, 4), (null, null, null, 7), (null, null, null, 8))
      .toDF("a", "b", "c", "d")))
  }

  test("broadcast_join.test: left join with left AND other condition") {
    val j = t2.as("b").join(broadcast(t1.as("a")),
        $"b.id" === $"a.id" && $"b.value" > 5 && $"a.value" >= $"b.value", "left")
      .select($"a.id", $"a.value", $"b.id", $"b.value")
    assert(rows4(j) === rows4(Seq[(Integer, Integer, Integer, Integer)](
      (5, 6, 5, 6), (null, null, 3, 4), (null, null, 5, 7),
      (null, null, 5, 8), (null, null, null, 7), (null, null, null, 8))
      .toDF("a", "b", "c", "d")))
  }

  test("broadcast_join.test: right join with RIGHT-side ON condition t1.value < 6") {
    val j = t2.as("b").join(t1.as("a"),
        $"b.id" === $"a.id" && $"a.value" < 6, "right")
      .select($"a.id", $"a.value", $"b.id", $"b.value")
    assert(rows4(j) === rows4(Seq[(Integer, Integer, Integer, Integer)](
      (1, 2, null, null), (3, 4, 3, 4), (3, 5, 3, 4), (3, 6, null, null),
      (5, 6, null, null), (7, 8, null, null), (9, 10, null, null),
      (null, 11, null, null), (null, 12, null, null), (10, null, null, null),
      (null, null, null, null)).toDF("a", "b", "c", "d")))
  }

  test("broadcast_join.test: right join with right AND other condition") {
    val j = t2.as("b").join(t1.as("a"),
        $"b.id" === $"a.id" && $"a.value" < 6 && $"a.value" > $"b.value", "right")
      .select($"a.id", $"a.value", $"b.id", $"b.value")
    assert(rows4(j) === rows4(Seq[(Integer, Integer, Integer, Integer)](
      (1, 2, null, null), (3, 4, null, null), (3, 5, 3, 4), (3, 6, null, null),
      (5, 6, null, null), (7, 8, null, null), (9, 10, null, null),
      (null, 11, null, null), (null, 12, null, null), (10, null, null, null),
      (null, null, null, null)).toDF("a", "b", "c", "d")))
  }

  test("broadcast_join.test: EXISTS / NOT EXISTS with correlated other conditions") {
    t1.createOrReplaceTempView("bj_t1")
    t2.createOrReplaceTempView("bj_t2")
    def run(sql: String) = spark.sql(sql).collect()
      .map(r => (r.get(0), r.get(1))).toSet
    assert(run("""SELECT * FROM bj_t1 t1 WHERE EXISTS
        (SELECT id FROM bj_t2 t2 WHERE t2.value = t1.value)""") ===
      Set((3, 4), (3, 6), (5, 6), (7, 8)))
    assert(run("""SELECT * FROM bj_t1 t1 WHERE EXISTS
        (SELECT id FROM bj_t2 t2 WHERE t2.value = t1.value AND t2.id > t1.id)""") ===
      Set((3, 6)))
    assert(run("""SELECT * FROM bj_t1 t1 WHERE NOT EXISTS
        (SELECT id FROM bj_t2 t2 WHERE t2.value = t1.value)""") ===
      Set((1, 2), (3, 5), (9, 10), (null, 11), (null, 12), (10, null),
        (null, null)))
    assert(run("""SELECT * FROM bj_t1 t1 WHERE NOT EXISTS
        (SELECT id FROM bj_t2 t2 WHERE t2.value = t1.value AND t2.id < t1.id)""") ===
      Set((1, 2), (3, 4), (3, 5), (3, 6), (5, 6), (9, 10), (null, 11),
        (null, 12), (10, null), (null, null)))
  }

  test("broadcast_join.test: EXISTS self-join composition (the TPC-H Q21 shape)") {
    t1.createOrReplaceTempView("bj_t1")
    val got = spark.sql(
      """SELECT * FROM bj_t1 t1 WHERE value > 5 AND EXISTS
        |  (SELECT * FROM bj_t1 t2 WHERE t1.id = t2.id AND t1.value <> t2.value)
        |AND NOT EXISTS
        |  (SELECT * FROM bj_t1 t3 WHERE t1.id = t3.id AND t1.value <> t3.value
        |   AND t3.value > 5)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === Set((3, 6)))
    val got2 = spark.sql(
      """SELECT * FROM bj_t1 t1 WHERE NOT EXISTS
        |  (SELECT * FROM bj_t1 t3 WHERE t1.id = t3.id AND t1.value <> t3.value)"""
        .stripMargin)
      .collect().map(r => (r.get(0), r.get(1))).toSet
    assert(got2 === Set((1, 2), (5, 6), (7, 8), (9, 10), (null, 11),
      (null, 12), (10, null), (null, null)))
  }

  test("broadcast_join.test: NOT NULL key tables outer-join counts") {
    val t1n = Seq((0, 1), (1, 2), (3, 4), (4, 5), (5, 6)).toDF("id", "value")
    val t2n = Seq((4, 5), (5, 6), (6, 7)).toDF("id", "value")
    val left = t1n.as("a").join(broadcast(t2n.as("b")), $"a.id" === $"b.id", "left")
    assert(left.count() === 5L)
    assert(left.select(count($"b.id")).head().getLong(0) === 2L)
    val right = t1n.as("a").join(broadcast(t2n.as("b")), $"a.id" === $"b.id", "right")
    assert(right.count() === 3L)
    assert(right.select(count($"a.id")).head().getLong(0) === 2L)
    assert(right.where($"a.id".isNull).select($"b.id", $"b.value")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq === Seq((6, 7)))
  }

  test("broadcast_join.test: DECIMAL(10,2) vs DECIMAL(6,3) key join widens losslessly") {
    val t1d = Seq((0, 1), (1, 2), (3, 4), (4, 5), (5, 6)).toDF("i", "value")
      .select($"i".cast("decimal(10,2)").as("id"), $"value")
    val t2d = Seq((4, 5), (5, 6), (6, 7)).toDF("i", "value")
      .select($"i".cast("decimal(6,3)").as("id"), $"value")
    val inner = t1d.as("a").join(broadcast(t2d.as("b")), $"a.id" === $"b.id")
    assert(inner.count() === 2L)
    assert(inner.select($"a.id".cast("string"), $"b.id".cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ===
      Seq(("4.00", "4.000"), ("5.00", "5.000")))
    val left = t1d.as("a").join(broadcast(t2d.as("b")), $"a.id" === $"b.id", "left")
    assert(left.count() === 5L &&
      left.select(count($"b.id")).head().getLong(0) === 2L)
    val right = t1d.as("a").join(broadcast(t2d.as("b")), $"a.id" === $"b.id", "right")
    assert(right.count() === 3L &&
      right.select(count($"a.id")).head().getLong(0) === 2L)
  }

  test("mpp_join.test: derived-table expression keys join and order") {
    val t = Seq[(Integer, java.lang.Double, String)](
      (1, 2.3, "fzh"), (2, 4.5, "pingcap"), (3, 6.7, "tidb"),
      (1, null, "abc"), (null, null, null)).toDF("id", "value", "name")
    val b = t.select((lit(1) + $"id" - 1).as("id"))
    val a = t.select($"id", ($"value" + 1).as("v1"))
    val got = b.as("b").join(a.as("a"), $"b.id" === $"a.id")
      .select($"b.id").orderBy($"b.id")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 1, 1, 1, 2, 3))
  }
}
