package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.Ingest
import graft.sources.Tables

/** End-to-end Structured Streaming ingest: replay the events table as a
  * stream, append to a versioned store, and check the streamed snapshot
  * equals the batch-computed snapshot (continuous ingest + consistent
  * read, SURVEY §2.6). */
class StreamingSpec extends SparkTestBase {

  test("streamed versioned table snapshot equals batch snapshot") {
    val base = Files.createTempDirectory("graft-ingest")
    val in = base.resolve("in")
    Files.createDirectories(in)
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      in.resolve("events.parquet"))
    val out = base.toString + "/versioned"
    Ingest.streamIngest(spark, in.toString, out)

    val streamed = spark.read.parquet(out)
    val batch = Ingest.versioned(Tables.events(spark, sf))
    assert(streamed.count() === batch.count())

    val snapStream = Ingest.snapshot(streamed, 800L)
      .select(col("user_id"), col("version"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val snapBatch = Ingest.snapshot(batch, 800L)
      .select(col("user_id"), col("version"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snapStream === snapBatch && snapStream.nonEmpty)
  }
}
