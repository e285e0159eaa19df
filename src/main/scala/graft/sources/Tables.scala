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
    // events.ts is parquet TIMESTAMP(NANOS): Spark reads it as a long
    // (spark.sql.legacy.parquet.nanosAsLong=true, set in our session
    // builders); convert to a microsecond timestamp exactly as DuckDB
    // does (truncating integer division — `div` stays in long math).
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
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
