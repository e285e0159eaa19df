package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic generated table as a full DataSource V2 connector —
  * the Spark-native analog of the reference's mock-storage tables for
  * executor tests (`/root/reference/dbms/src/TestUtils/mockExecutor.h:63-176`)
  * AND of its pack-level rough-set scan pruning: each input partition
  * covers a contiguous `id` range and publishes that range as its
  * min/max statistic, so pushed `id` predicates SKIP whole partitions
  * at planning time, exactly as TiFlash's MinMaxIndex skips packs
  * (`dbms/src/Storages/DeltaMerge/Index/MinMaxIndex.h:31`).
  *
  * Surface: `spark.read.format("graft.sources.GenSource")
  *   .option("rows", n).option("slices", k).load()` with schema
  * (id BIGINT, val BIGINT, tag STRING), id = 0..n-1,
  * val = (id*2654435761) % 1000003 (deterministic hash),
  * tag = "t" + id % 7.
  *
  * Pushdown honored — the reference's full storage-read surface:
  * `SupportsPushDownRequiredColumns` prunes the generated columns;
  * `SupportsPushDownFilters` accepts range/equality predicates on `id`
  * (reported as PushedFilters, used to skip partitions wholesale and
  * narrow the generated range); `SupportsPushDownAggregates` computes
  * COUNT/MIN/MAX group partials inside the source (cop-level partial
  * aggregation); `SupportsPushDownLimit`/`SupportsPushDownTopN`
  * truncate the id range (TopN over the keep-order handle column);
  * `SupportsRuntimeFiltering` narrows partitions at EXECUTION time
  * from a join build side's id set (`DataStreams/RuntimeFilter.h`).
  * Everything else stays with Spark as post-scan work.
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("partitionByTag", "false").toBoolean)
}

object GenSource {
  val schema: StructType = new StructType()
    .add("id", LongType).add("val", LongType).add("tag", StringType)

  def valOf(id: Long): Long = (id * 2654435761L) % 1000003L
  def tagOf(id: Long): String = "t" + (id % 7)
}

private[sources] class GenTable(rows: Long, slices: Int, tagged: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    if (tagged) new GenTagScanBuilder(rows) else new GenScanBuilder(rows, slices)
}

/** Storage-partitioned variant: one input partition per `tag` value,
  * each declaring its partition key, with the scan reporting
  * KeyGroupedPartitioning(identity(tag)) — Spark's storage-partitioned
  * join then co-locates two such tables WITHOUT any exchange, the DSv2
  * form of the reference's partitioned MPP exchange elision /
  * fine-grained pre-bucketed streams
  * (`docs/design/2022-06-14-fine-grained-shuffle.md`). */
private[graft] class GenTagScanBuilder(rows: Long) extends ScanBuilder {
  override def build(): Scan = new GenTagScan(rows)
}

private[graft] case class GenTagPartition(tag: Int, rows: Long)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString("t" + tag))
}

private[graft] class GenTagScan(rows: Long) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = GenSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"graft_gen TAG-partitioned rows=$rows"

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions.identity("tag")), 7)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until 7).map(t => GenTagPartition(t, rows): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[GenTagPartition]
        new PartitionReader[InternalRow] {
          private var cur = p.tag.toLong - 7
          override def next(): Boolean = { cur += 7; cur < p.rows }
          override def get(): InternalRow = InternalRow(
            cur, GenSource.valOf(cur), UTF8String.fromString(GenSource.tagOf(cur)))
          override def close(): Unit = ()
        }
      }
    }
}

private[graft] class GenScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  private var lo = 0L // inclusive id lower bound after pushdown
  private var hi = rows // exclusive id upper bound after pushdown
  private var pushed = Array.empty[Filter]
  private var required: StructType = GenSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      // every generated column is non-null: IsNotNull is vacuously true
      // (and must be absorbed or it blocks aggregate pushdown)
      case IsNotNull(_) => true
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue()); hi = math.min(hi, v.longValue() + 1)
      case GreaterThan("id", v: Number) => lo = math.max(lo, v.longValue() + 1)
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue())
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue())
      case LessThanOrEqual("id", v: Number) => hi = math.min(hi, v.longValue() + 1)
      case _ =>
    }
    pushed = accepted
    rest // Spark re-applies these post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown (≙ the reference's coprocessor-level
  // aggregation: TiDB pushes the partial agg INTO the storage read,
  // `Flash/Coprocessor/DAGStorageInterpreter.cpp`) ----
  private var aggregation: Option[Aggregation] = None

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
      case _ => None
    }

  /** Accept COUNT(*) / COUNT(col) / MIN(id) / MAX(id), optionally
    * grouped by `tag` — each computable from the generator arithmetic
    * without materializing a single row. Partial pushdown: every
    * partition emits its group partials; Spark runs the final merge. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val groupsOk = agg.groupByExpressions.toSeq match {
      case Seq() => true
      case Seq(g) => fieldOf(g).contains("tag")
      case _ => false
    }
    val aggsOk = agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        // every generated column is non-null, so COUNT(any non-distinct
        // expr) over a partition equals its row count
        case c: Count => !c.isDistinct
        case m: Min => fieldOf(m.column).contains("id")
        case m: Max => fieldOf(m.column).contains("id")
        case _ => false
      }
    if (groupsOk && aggsOk) { aggregation = Some(agg); true } else false
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = false

  // ---- limit / top-N pushdown (≙ the reference's TopN executor pushed
  // into the storage read when the sort key is the handle column —
  // `Plans/PhysicalTopN.cpp` over a keep-order TableScan) ----
  private var limit: Option[Int] = None
  private var topNDesc = false
  private var partiallyPushed = false

  /** The generated table is id-ordered, so a bare LIMIT truncates the
    * id range exactly (LIMIT has no ordering contract, so emitting the
    * first n surviving ids from parallel partitions is a COMPLETE
    * pushdown). */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    true
  }
  override def isPartiallyPushed(): Boolean = partiallyPushed

  /** ORDER BY id [DESC] LIMIT n — the storage order IS the id order, so
    * the scan narrows to the n ids at the matching END of the range.
    * Partitions are read in parallel (no cross-partition order
    * guarantee), so this is a PARTIAL pushdown: Spark re-sorts the ≤n
    * surviving rows — the reference's partial-sort-then-merge TopN
    * (`MergeSortingBlockInputStream.cpp`). */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    val onId = orders.length == 1 && (orders.head.expression() match {
      case f: NamedReference => f.fieldNames.sameElements(Array("id"))
      case _ => false
    })
    if (!onId) return false
    limit = Some(n)
    topNDesc = orders.head.direction() == SortDirection.DESCENDING
    partiallyPushed = true
    true
  }

  override def build(): Scan = {
    val (l, h) = limit match {
      case Some(n) if !topNDesc => (lo, math.min(hi, lo + n))
      case Some(n) => (math.max(lo, hi - n), hi)
      case None => (lo, hi)
    }
    aggregation match {
      case Some(agg) => new GenAggScan(rows, slices, lo, hi, agg)
      case None => new GenScan(rows, slices, l, h, required)
    }
  }
}

private[sources] case class GenPartition(start: Long, end: Long)
    extends InputPartition

private[graft] class GenScan(rows: Long, slices: Int, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {
  /** Keep-order scan (≙ the reference TableScan's keep_order option —
    * DeltaTree data arrives handle-sorted, `DAGStorageInterpreter.cpp`):
    * each partition emits ids ascending, so Spark can elide
    * partition-local sorts on the handle column. */
  override def outputOrdering(): Array[SortOrder] =
    if (required.fieldNames.contains("id"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions.column("id"),
        SortDirection.ASCENDING))
    else Array.empty
  // runtime narrowing from a join's build side (≙ the reference's
  // RuntimeFilter: the hash-join build pushes an IN / MIN_MAX filter
  // into the probe-side TableScan at EXECUTION time,
  // `DataStreams/RuntimeFilter.h:25-91`)
  private var rtLo = lo
  private var rtHi = hi

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("id", values) if values.nonEmpty =>
      val longs = values.collect { case n: Number => n.longValue() }
      if (longs.nonEmpty) {
        rtLo = math.max(rtLo, longs.min)
        rtHi = math.min(rtHi, longs.max + 1)
      }
    case _ => () // unsupported runtime filters are advisory only
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_gen rows=$rows slices=$slices prunedRange=[$lo,$hi)"

  /** Rough-set skip: a partition whose [start,end) id range misses the
    * pushed (and runtime-narrowed) [lo,hi) bound is never planned — the
    * MinMaxIndex analog. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => GenPartition(i * per, math.min(rows, (i + 1) * per)))
      .filter(p => p.end > rtLo && p.start < rtHi) // min/max skip
      .map(p => GenPartition(math.max(p.start, rtLo), math.min(p.end, rtHi)))
      .filter(p => p.end > p.start)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required)
}

/** Storage-side aggregation: each surviving partition computes its
  * group partials (COUNT/MIN/MAX over the contiguous id range) from the
  * generator arithmetic — O(groups) work, zero rows materialized, the
  * exact shape of the reference's cop-level partial aggregation. */
private[sources] class GenAggScan(rows: Long, slices: Int, lo: Long, hi: Long,
    agg: Aggregation) extends Scan with Batch {
  private val grouped = agg.groupByExpressions.nonEmpty

  override def readSchema(): StructType = {
    // group-by columns FIRST, then the aggregate partials — the layout
    // V2ScanRelationPushDown expects from a partial-pushdown scan
    var s = new StructType()
    if (grouped) s = s.add("tag", StringType)
    agg.aggregateExpressions.zipWithIndex.foreach { case (_, i) =>
      s = s.add(s"agg$i", LongType)
    }
    s
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_gen AGG-pushed rows=$rows prunedRange=[$lo,$hi) grouped=$grouped"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => GenPartition(i * per, math.min(rows, (i + 1) * per)))
      .filter(p => p.end > lo && p.start < hi)
      .map(p => GenPartition(math.max(p.start, lo), math.min(p.end, hi)))
      .filter(p => p.end > p.start)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val aggCount = agg.aggregateExpressions.length
    val isMin = agg.aggregateExpressions.map(_.isInstanceOf[Min])
    val isMax = agg.aggregateExpressions.map(_.isInstanceOf[Max])
    val g = grouped
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[GenPartition]
        // per (partition, tag-group) partials from pure arithmetic
        val groups: Seq[(Option[Int], Long, Long, Long)] =
          if (!g) Seq((None, p.end - p.start, p.start, p.end - 1))
          else (0 until 7).flatMap { tag =>
            val first = p.start + (((tag - (p.start % 7).toInt) + 7) % 7)
            if (first >= p.end) None
            else {
              val n = (p.end - 1 - first) / 7 + 1
              Some((Some(tag), n, first, first + 7 * (n - 1)))
            }
          }
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < groups.length }
          override def get(): InternalRow = {
            val (tag, n, mn, mx) = groups(i)
            val aggVals: Seq[Any] = (0 until aggCount).map { k =>
              if (isMin(k)) mn else if (isMax(k)) mx else n
            }
            InternalRow.fromSeq(
              tag.map(t => UTF8String.fromString("t" + t)).toSeq ++ aggVals)
          }
          override def close(): Unit = ()
        }
      }
    }
  }
}

private[sources] class GenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenPartition]
    // column pruning: only the requested fields are generated
    val gens: Array[Long => Any] = required.fields.map(_.name match {
      case "id" => (id: Long) => id
      case "val" => (id: Long) => GenSource.valOf(id)
      case "tag" => (id: Long) => UTF8String.fromString(GenSource.tagOf(id))
    })
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(cur)).toSeq)
      override def close(): Unit = ()
    }
  }
}
