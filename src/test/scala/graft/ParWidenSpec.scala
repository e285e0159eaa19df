package graft

import org.apache.spark.sql.functions._
import graft.operators.Par

/** The gated width-repartition (r18, VERDICT r17 ask #3): the r17
  * unconditional `repartition(Par.width)` before per-row CPU stages is
  * correct on the bench fixture's one-file scans but a pure
  * corpus-payload shuffle at 100 TB, where the same scan already has
  * thousands of splits. [[Par.widen]] keeps the exchange exactly when
  * the scan cannot supply the parallelism. */
class ParWidenSpec extends SparkTestBase {

  test("widen adds the round-robin exchange when the scan cannot parallelize (one small file)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(Par.estimatedScanSplits(docs) < Par.width(spark),
      "the fixture table must look like the unsplittable bench scan")
    val plan = Par.widen(docs).queryExecution.executedPlan.toString
    assert(plan.contains("RoundRobinPartitioning"),
      s"expected the width exchange on a one-file scan; got\n$plan")
  }

  test("widen is a no-op (no new exchange) when the scan already has >= width splits") {
    val dir = java.nio.file.Files.createTempDirectory("graft-widen").toString
    spark.range(64L * 200)
      .selectExpr("id as doc_id",
        "concat('the a be to of and that have with w', cast(id % 10 as string)) as text")
      .repartition(64).write.mode("overwrite").parquet(dir)
    val keys = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes", "spark.sql.files.minPartitionNum")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      // make the 64 small part files count as >= 64 splits, the shape a
      // 100 TB table's scan has by default
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      spark.conf.set("spark.sql.files.openCostInBytes", "65536")
      spark.conf.set("spark.sql.files.minPartitionNum", "64")
      val df = spark.read.parquet(dir)
      assert(Par.estimatedScanSplits(df) >= Par.width(spark))
      val w = Par.widen(df)
      assert(w eq df, "widen must return the input untouched when the scan parallelizes")
      assert(!w.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"),
        "no round-robin exchange may appear on a many-split scan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
    }
  }

  test("a gated stage's rows are invariant to the gate's decision (corpusGrams both ways)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-widen-inv").toString
    spark.range(400)
      .selectExpr("id as doc_id",
        "concat('alpha beta gamma delta w', cast(id % 7 as string), ' epsilon zeta') as text")
      .repartition(64).write.mode("overwrite").parquet(dir)
    def grams(): Array[String] =
      graft.operators.Curation.corpusGrams(spark.read.parquet(dir), 2)
        .selectExpr("concat_ws('|', cast(doc_id as string), gram) as r")
        .collect().map(_.getString(0)).sorted
    val keys = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes", "spark.sql.files.minPartitionNum")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    val gateOn = grams() // default conf: splits < width, exchange present
    val gateOff =
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        spark.conf.set("spark.sql.files.openCostInBytes", "65536")
        spark.conf.set("spark.sql.files.minPartitionNum", "64")
        grams() // many-split shape: exchange skipped
      } finally saved.foreach { case (k, v) =>
        v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
      }
    assert(gateOn.nonEmpty && (gateOn.toSeq === gateOff.toSeq),
      "the width exchange must never change a per-row stage's output")
  }
}
