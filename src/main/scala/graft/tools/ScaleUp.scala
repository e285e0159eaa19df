package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic local scale-up of the driver's testdata: replicate
  * the FACT tables (`lineitem`, `orders`, `events`, `documents`,
  * `embeddings`) `factor`× with disjoint key ranges per copy, keep
  * the dimension tables as-is (dimensions grow sublinearly in real
  * deployments — the broadcast-ability of `nation`/`region`/
  * `customer` is part of the plan shape being validated, not an
  * artifact to scale away).
  *
  * Used by the round-N scale-proof bench (`docs/BENCH_NOTES.md`): the
  * headline queries must grow ≈linearly in wall-time from sf0.1 to
  * factor× — any super-linear query is a plan flaw at 100 TB.
  *
  * Copy-discrimination choices that keep workloads honest:
  *  - `documents.text`: copy 0 is verbatim; copy c > 0 suffixes every
  *    token with `_c`. Shingle sets of different copies are therefore
  *    DISJOINT — the near-dup/set-similarity workloads (q61, q201,
  *    q63) see `factor`× the original pair structure instead of an
  *    artificial everything-matches-everything pile, so their OUTPUT
  *    (and thus their honest cost) scales linearly.
  *  - `embeddings.embedding`: copy c is shifted by a small
  *    deterministic per-dimension delta — clones are near the
  *    original's cluster but never exactly coincident (no degenerate
  *    zero-distance top-k ties).
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {

  private val KeyBase = Map(
    "orders" -> 1000000L, "events_user" -> 10000L,
    "events_id" -> 1000000L, "docs" -> 100000L)

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame): DataFrame =
      df.withColumn("copy", explode(sequence(lit(0), lit(factor - 1))))

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name done")
    }

    // dimensions: verbatim
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(spark.read.parquet(s"$src/$t.parquet"), t)

    write(copies(spark.read.parquet(s"$src/orders.parquet"))
      .withColumn("o_orderkey", col("o_orderkey") + col("copy") * KeyBase("orders"))
      .drop("copy"), "orders")

    write(copies(spark.read.parquet(s"$src/lineitem.parquet"))
      .withColumn("l_orderkey", col("l_orderkey") + col("copy") * KeyBase("orders"))
      .drop("copy"), "lineitem")

    write(copies(spark.read.parquet(s"$src/events.parquet"))
      .withColumn("event_id", col("event_id") + col("copy") * KeyBase("events_id"))
      .withColumn("user_id", col("user_id") + col("copy") * KeyBase("events_user"))
      .drop("copy"), "events")

    val docs = copies(spark.read.parquet(s"$src/documents.parquet"))
      .withColumn("doc_id", col("doc_id") + col("copy") * KeyBase("docs"))
      .withColumn("text",
        when(col("copy") === 0, col("text")).otherwise(
          array_join(transform(split(trim(col("text")), "\\s+"),
            x => concat(x, lit("_"), col("copy").cast("string"))), " ")))
      .withColumn("n_chars", length(col("text")))
      .drop("copy")
    write(docs, "documents")

    write(copies(spark.read.parquet(s"$src/embeddings.parquet"))
      .withColumn("vec_id", col("vec_id") + col("copy") * KeyBase("docs"))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x + col("copy").cast("float") * lit(0.0037f) *
            (lit(1.0f) + (i % 7).cast("float"))).cast("float")))
      .drop("copy"), "embeddings")

    spark.stop()
  }
}
