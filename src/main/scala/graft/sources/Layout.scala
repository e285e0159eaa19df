package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Write-layout helpers that keep parquet row-group min/max statistics
  * selective — the Spark-native lever behind the reference's pack-level
  * rough-set index
  * (`/root/reference/dbms/src/Storages/DeltaMerge/Index/MinMaxIndex.h:31`,
  * consulted by `RSOperator` filters before a pack is decoded).
  *
  * The reference keeps min/max for EVERY column of every pack, but the
  * stats only prune when the layout clusters the filtered column; its
  * PK-sorted DeltaTree layout makes them tight on the handle column
  * alone. For a second (and third) filter column, the standard
  * warehouse answer is a space-filling-curve sort: interleaving the
  * bits of both keys gives a single sort order under which row-group
  * min/max stay tight on EACH dimension, so a selective predicate on
  * either column skips most groups at scan time. At 100 TB this is the
  * difference between decoding every row group and decoding ~sqrt of
  * them for a 2-D point/range query — no index structure needed beyond
  * the parquet footers Spark already reads.
  */
object Layout {

  /** Spread the low 16 bits of a non-negative long so one zero bit
    * separates consecutive payload bits (0bABCD -> 0bA0B0C0D0). The
    * classic mask ladder, expressed as codegen'd column arithmetic.
    */
  private def spreadBits16(v: Column): Column = {
    val m = Seq(
      (8, 0x00FF00FFL),
      (4, 0x0F0F0F0FL),
      (2, 0x33333333L),
      (1, 0x55555555L))
    m.foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (acc, (sh, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, sh))).bitwiseAND(lit(mask))
    }
  }

  /** Z-order (Morton) key over two non-negative integer columns, each
    * truncated to its low 16 bits. Sorting a write by this key
    * clusters BOTH dimensions, so parquet row-group stats prune scans
    * filtered on either column — multi-column pack skipping from a
    * single sort order. Use as
    * `df.orderBy(Layout.zorderKey($"x", $"y")).write.parquet(...)`.
    */
  def zorderKey(x: Column, y: Column): Column =
    spreadBits16(x.cast("long"))
      .bitwiseOR(shiftleft(spreadBits16(y.cast("long")), 1))
      .as("z_key")
}
