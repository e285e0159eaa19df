package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.sources.Tables

/** Contracts for the Bloom-prefiltered decontamination: exactness (the
  * Bloom stage must be invisible in the result — no false negatives,
  * false positives killed by the confirm join) and the prefilter's
  * actual selectivity (the reason the plan scales). */
class CurationBloomSpec extends SparkTestBase {

  test("q212 result is exactly the no-bloom n-gram decontamination") {
    val out = SparkEntry.queries("q212_bloom_decontaminate")(spark, sf)
    val grams = Curation.corpusGrams(Tables.documents(spark, sf), 8)
    val bench = grams.filter(col("doc_id") % 41 === 0)
      .withColumnRenamed("doc_id", "bench_id")
    val exact = grams.join(bench, "gram")
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("doc_id")).as("n_contaminated"),
        countDistinct(col("gram")).as("n_grams_hit"))
    assert(out.count() > 0, "fixture must produce contaminated benchmarks")
    assert(out.except(exact).count() === 0L)
    assert(exact.except(out).count() === 0L)
  }

  test("bloom prefilter keeps every benchmark gram (no false negatives)") {
    val grams = Curation.corpusGrams(Tables.documents(spark, sf), 8).cache()
    try {
      val bench = grams.filter(col("doc_id") % 41 === 0)
      val bf = bench.stat.bloomFilter("gram", math.max(bench.count(), 1L), 0.01)
      val bc = spark.sparkContext.broadcast(bf)
      val might = udf((g: String) => bc.value.mightContainString(g))
      val missed = bench.filter(!might(col("gram"))).count()
      assert(missed === 0L, "a Bloom filter can never reject an inserted key")
      // and it must actually filter: clean grams survive at ~FPP, so the
      // candidate set is well under the full corpus gram count
      val total = grams.count()
      val kept = grams.filter(might(col("gram"))).count()
      assert(kept < total,
        s"prefilter must drop some clean grams (kept $kept of $total)")
    } finally grams.unpersist(blocking = false)
  }

  test("q224 group k-fold: every source lands in exactly one fold") {
    val out = SparkEntry.queries("q224_group_kfold")(spark, sf).collect()
    val totalSources = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    // if any source were split across folds, per-fold distinct counts
    // would overcount the global distinct total
    assert(out.map(_.getAs[Long]("n_sources")).sum === totalSources)
    assert(out.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
    assert(out.forall(r => r.getAs[Long]("fold") >= 0 && r.getAs[Long]("fold") < 5))
  }
}
