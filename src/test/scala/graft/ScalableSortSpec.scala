package graft

import org.apache.spark.sql.functions._
import graft.operators.ScalableSort

/** Pins the Spark-internal row-materialization assumption behind
  * `ColumnBridge.internalCreateDataFrame` (ADVICE r17 #3): the r17
  * globalRowNumber feeds JoinedRow-backed InternalRows into a
  * `private[sql]` API and relies on RDDScanExec applying an
  * UnsafeProjection before anything downstream consumes the rows. A
  * Spark version change that stops materializing them must surface
  * here, not in a production query. */
class ScalableSortSpec extends SparkTestBase {

  test("globalRowNumber output survives a downstream shuffle/aggregate (string + rank columns)") {
    import spark.implicits._
    val rows = (1 to 1000).map(i => (s"k${i % 7}", (i * 37) % 1000, s"pay-$i"))
    val df = rows.toDF("grp", "v", "pay")
    val ranked = ScalableSort.globalRowNumber(df, "rn", col("v"), col("pay"))
    // downstream shuffle + hash aggregate over the bridged rows —
    // string key, long rank — exactly the consumption shape q214/q228
    // style callers use
    val got = ranked.groupBy(col("grp"))
      .agg(sum(col("rn")).as("s"), countDistinct(col("pay")).as("n"))
      .orderBy(col("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = rows.sortBy(t => (t._2, t._3)).zipWithIndex
      .map { case ((g, _, p), idx) => (g, idx + 1L, p) }
      .groupBy(_._1).map { case (g, rs) =>
        (g, rs.map(_._2).sum, rs.map(_._3).distinct.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(got === exp)
    // and a rank-keyed self-join (a second, differently-keyed shuffle
    // of the bridged rows)
    val j = ranked.select(col("rn"), col("pay"))
      .join(ranked.select(col("rn").as("rn2"), col("pay").as("pay2")),
        col("rn") === col("rn2"))
      .filter(col("pay") === col("pay2"))
    assert(j.count() === 1000L)
  }
}
