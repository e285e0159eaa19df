package graft

import org.apache.spark.sql.functions._
import graft.operators.InvertedText
import graft.sources.Tables

/** Inverted-index contract: the stored posting table answers
  * CONTAINS-style queries through a pushed term filter (probe cost ∝
  * posting-list size, not corpus size — ≙ the reference's
  * InvertedIndex/FullTextIndex readers), and the result set equals a
  * direct scan-and-filter of the text. */
class InvertedIndexSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, sf)

  test("stored posting table: term filter is pushed to the index scan") {
    val idx = java.nio.file.Files.createTempDirectory("graft-postings").toString
    InvertedText.buildPostings(docs).write.mode("overwrite").parquet(idx)
    val stored = spark.read.parquet(idx)
    val res = InvertedText.searchAll(stored, Seq("hash", "join"))
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"term IN filter did not reach the index scan:\n$plan")
  }

  test("searchAll equals a direct tokenize-scan of the corpus") {
    val viaIndex = InvertedText.searchAll(InvertedText.buildPostings(docs), Seq("hash", "join"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val w = split(trim(col("text")), "\\s+")
    val direct = docs
      .filter(array_contains(w, "hash") && array_contains(w, "join"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty, "probe terms should match some documents")
  }

  test("searchAny returns matched terms and a positive idf score") {
    val total = docs.count()
    val r = InvertedText.searchAny(InvertedText.buildPostings(docs),
      Seq("hash", "join"), total).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val matched = row.getSeq[String](1)
      assert(matched.nonEmpty && matched.forall(Set("hash", "join")))
      assert(row.getDouble(2) > 0.0, "idf score must be positive")
    }
  }

  test("prefix probe pushes StartsWith and row-group-prunes the term-sorted index") {
    // the wildcard form `term LIKE 'pref%'`: a term-SORTED stored index
    // keeps row-group min/max tight on term, so the pushed StartsWith
    // decodes only the groups whose term range overlaps the prefix —
    // dictionary-range probing as the reference's index readers do
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val idx = java.nio.file.Files.createTempDirectory("graft-prefix").toString
    // corpus vocab at test SF is tiny; a 50k-term synthetic vocabulary
    // gives the index table enough row groups to show the pruning
    spark.range(0, 50000)
      .select(format_string("t%05d", col("id")).as("term"),
        concat_ws("-", (1 to 8).map(i => md5(concat(col("id"), lit(i)))): _*).as("postings_blob"),
        (col("id") % 97).as("df"))
      .orderBy(col("term")).coalesce(1)
      .write.option("parquet.block.size", 32 * 1024)
      .mode("overwrite").parquet(idx)
    val stored = spark.read.parquet(idx)
    val total = stored.count()
    val q = stored.filter(col("term").startsWith("t012")).select(col("term"), col("df"))
    val rows = q.collect()
    assert(rows.length === 100 && rows.forall(_.getString(0).startsWith("t012")))
    val executed = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = executed.collectLeaves().collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.metadata("PushedFilters").contains("StringStartsWith(term,t012)"),
      s"prefix must reach the index scan: ${scan.metadata("PushedFilters")}")
    val emitted = scan.metrics("numOutputRows").value
    assert(emitted < total / 4,
      s"term-sorted index should skip row groups for a prefix probe: $emitted of $total")
  }

  test("schema evolution: a later segment adds a column, merged read nulls the old rows") {
    // ≙ the reference applying DDL to DeltaTree segments lazily — old
    // packs keep the old schema, reads reconcile (`Storages/DeltaMerge/`
    // schema versioning). Parquet mergeSchema is the Spark-native form.
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    docs.select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(dir)
    docs.select(col("doc_id") + 1000000L as "doc_id", col("lang"),
        col("n_chars")) // v2 adds a column
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "lang", "n_chars"))
    val n = docs.count()
    assert(merged.count() === 2 * n)
    // old-segment rows surface with NULL for the added column
    assert(merged.filter(col("doc_id") < 1000000L && col("n_chars").isNull).count() === n)
    assert(merged.filter(col("doc_id") >= 1000000L && col("n_chars").isNotNull).count() === n)
  }
}
