package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver's parquet testdata.
  *
  * Mirrors the reference's storage read surface (TiFlash
  * `StorageDeltaMerge` MVCC snapshot scan with column projection and
  * filter pushdown, `/root/reference/dbms/src/Storages/StorageDeltaMerge.cpp`)
  * with Spark's Parquet DSv2 scan: column pruning + predicate pushdown +
  * row-group stat skipping are the Spark-native analog of TiFlash's
  * pack-level min-max rough-set index
  * (`/root/reference/dbms/src/Storages/DeltaMerge/Index/MinMaxIndex.h:31`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The small dimension tables — always broadcast-joinable. At 100 TB,
    * region/nation stay tiny and supplier/customer/part grow with SF but
    * remain orders of magnitude smaller than the fact tables.
    */
  val dims: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Normalize `events.ts` to a microsecond timestamp regardless of how
    * the generator wrote the parquet. Historically the column has been
    * produced both as TIMESTAMP(NANOS) — which Spark reads as a long
    * under `spark.sql.legacy.parquet.nanosAsLong=true` — and as
    * TIMESTAMP(MICROS), which arrives as a ready timestamp. Branch on
    * the actual dtype so either vintage of the data reads correctly:
    * long nanos → truncating integer division to µs (matching DuckDB),
    * timestamp → pass through.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // session tz is pinned to UTC, so this cast is wall-clock- and
        // instant-preserving; it keeps `ts` usable with unix_micros &c.,
        // exactly what timestamp_micros produced for the nanos vintage
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
