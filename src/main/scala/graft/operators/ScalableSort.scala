package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ordering — the Spark mapping of the reference's
  * full Sort executor (`/root/reference/dbms/src/Flash/Planner/Plans/
  * PhysicalWindowSort.cpp`, external merge sort under fine-grained
  * shuffle, `docs/design/2022-06-14-fine-grained-shuffle.md`).
  *
  * A naive `row_number() OVER (ORDER BY ...)` with no PARTITION BY
  * collapses the whole table into one task — the classic scale-killer.
  * This operator computes the identical global rank in three bounded
  * steps, none of which ever sees more than one partition's rows in a
  * single task:
  *
  *   1. `repartitionByRange` on the sort key: partition i holds keys
  *      strictly before partition i+1's (Spark's RangePartitioner, the
  *      same machinery `ORDER BY` itself uses — sampled boundaries are
  *      deterministic for a given input).
  *   2. Per-partition `row_number()` windowed by the partition id —
  *      each task ranks only its own range.
  *   3. Global offset per partition = cumulative row-counts of the
  *      preceding partitions: a #partitions-row aggregate (bounded by
  *      cluster width, not data size), broadcast back.
  */
object ScalableSort {

  /** Append a global `row_number() OVER (ORDER BY sortCols)` column
    * named `out` without a single-partition window.
    *
    * The locally-ranked frame is PERSISTED before fan-out: the offsets
    * branch and the output branch both consume it, and if each re-ran
    * the lineage independently the two range exchanges could pick
    * DIFFERENT sampled boundaries (observed in practice when the
    * upstream lineage contains a cached relation — AQE stats differ
    * between executions, partition counts diverge, and the per-index
    * sampling seeds then yield different splits). Divergent boundaries
    * make the offsets table disagree with the pid labels in the output
    * branch — duplicate and skipped ranks. One materialization makes
    * the pid→count mapping definitionally consistent; lineage is kept
    * (fault-tolerant, unlike localCheckpoint), and the cached frame is
    * exactly the data being ranked — the same footprint an external
    * merge sort's run files would occupy. */
  def globalRowNumber(df: DataFrame, out: String, numParts: Int, sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(numParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val local = parted.withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .persist()
    // Unpartitioned window is over the numParts-row aggregate only —
    // bounded by cluster width, never by data size.
    val wCum = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .select(col("__pid"), coalesce(sum(col("__cnt")).over(wCum), lit(0L)).as("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }
}
