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
}
