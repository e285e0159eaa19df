package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source-format breadth: the engine's ingest surface is not
  * parquet-only — ORC, CSV, and JSON inputs round-trip through the same
  * DataFrame pipeline with identical content (the reference ingests
  * from the row store and re-encodes into its columnar format; here
  * each format is just another DSv2 scan feeding the same operators).
  * Schema-on-read formats (CSV/JSON) get the parquet schema applied
  * explicitly, the production posture for text inputs at scale. */
class SourcesSpec extends SparkTestBase {

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("doc_id"), col("lang"), col("n_chars"), md5(col("text")).as("h"))
      .collect().map(_.mkString("|")).toSet

  test("documents round-trip identically through orc, csv, and json sources") {
    val base = Files.createTempDirectory("graft-sources").toString
    val src = Tables.documents(spark, sf)
    val expected = canon(src)
    assert(expected.nonEmpty)

    src.write.mode("overwrite").orc(s"$base/docs_orc")
    assert(canon(spark.read.orc(s"$base/docs_orc")) === expected, "orc")

    // multiline text fields force proper CSV quoting/escaping
    src.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(s"$base/docs_csv")
    val csv = spark.read.schema(src.schema)
      .option("header", "true").option("escape", "\"").option("multiLine", "true")
      .csv(s"$base/docs_csv")
    assert(canon(csv) === expected, "csv")

    src.write.mode("overwrite").json(s"$base/docs_json")
    val json = spark.read.schema(src.schema).json(s"$base/docs_json")
    assert(canon(json) === expected, "json")
  }

  test("a filter pushes down into the orc scan like the parquet scan") {
    val base = Files.createTempDirectory("graft-sources-orc").toString
    Tables.documents(spark, sf).write.mode("overwrite").orc(s"$base/docs_orc")
    val plan = spark.read.orc(s"$base/docs_orc")
      .filter(col("n_chars") > 500).select(col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)"),
      s"expected pushed filter in ORC scan:\n$plan")
  }

  test("parquet compression codecs round-trip identically; zstd compresses text") {
    // ≙ the reference's per-column compression codecs (ClickHouse
    // heritage, CompressedStream settings): the storage codec is a
    // layout choice that must never change query results, only bytes
    // on disk. documents.text is compressible prose — zstd must beat
    // an uncompressed write by a wide margin.
    val base = Files.createTempDirectory("graft-codec").toString
    val docs = Tables.documents(spark, sf).orderBy(col("doc_id")).coalesce(1)
    def sizeOf(dir: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet")).map(_.length).sum
    }
    val expected = docs.count()
    val sizes = Seq("uncompressed", "snappy", "zstd").map { codec =>
      val dir = s"$base/$codec"
      docs.write.option("compression", codec).mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir)
      assert(back.count() === expected, s"$codec round-trip lost rows")
      assert(back.agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
        .crc32(col("text")))).first().getLong(0) ===
        docs.agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .crc32(col("text")))).first().getLong(0),
        s"$codec round-trip changed content")
      codec -> sizeOf(dir)
    }.toMap
    assert(sizes("zstd") < sizes("uncompressed") / 2,
      s"zstd should halve prose: $sizes")
    assert(sizes("snappy") < sizes("uncompressed"), s"snappy should compress: $sizes")
  }
}
