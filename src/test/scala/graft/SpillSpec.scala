package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Spill-path correctness ≙ the reference's spill tests
  * (`gtest_spill_aggregation.cpp`, external merge sort, join spill,
  * SURVEY §4 "spill to disk"): force window/sort/join buffers to spill
  * via their row-count thresholds (no need to starve the JVM) and
  * check results equal the in-memory run. */
class SpillSpec extends SparkTestBase {

  private val spillConfs = Seq(
    "spark.sql.windowExecBufferInMemoryThreshold" -> "16",
    "spark.sql.windowExecBufferSpillThreshold" -> "16",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "16",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "16")

  private def withSpill[T](f: => T): T = {
    val saved = spillConfs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption
    }
    try {
      spillConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      f
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("window frames spill and still match the in-memory result") {
    val q = SparkEntry.queries("q43_window_rows_frame")
    val inMem = q(spark, sf).collect().toSet
    val spilled = withSpill(q(spark, sf).collect().toSet)
    assert(spilled === inMem && spilled.nonEmpty)
  }

  test("sort-merge join spills and still matches") {
    def joined = {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
      li.hint("merge")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    val inMem = joined
    val spilled = withSpill(joined)
    assert(spilled === inMem && spilled.nonEmpty)
  }
}
