package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Contract tests for the distributed Lloyd's k-means: the classic
  * monotone-objective guarantee, determinism, and the plan shape that
  * keeps it scale-safe (broadcast assignment, no sort-merge join). */
class ClusteringSpec extends SparkTestBase {

  private def sse(iters: Int): Double =
    Clustering.kmeans(sources.Tables.embeddings(spark, sf), k = 8, iters = iters)
      .agg(sum(col("d"))).collect()(0).getDouble(0)

  test("Lloyd iterations do not increase the within-cluster SSE") {
    val s0 = sse(0); val s1 = sse(1); val s2 = sse(2)
    // exact Lloyd is monotone non-increasing; mean quantization to the
    // 1e-6 grid can perturb at ~1e-6 per dim — allow that epsilon
    val eps = 1e-3
    assert(s1 <= s0 + eps, s"iter1 SSE $s1 > iter0 SSE $s0")
    assert(s2 <= s1 + eps, s"iter2 SSE $s2 > iter1 SSE $s1")
    assert(s2 < s0, "two updates should strictly improve on the hash-sampled init")
  }

  test("assignment is total, bounded by k, and deterministic") {
    val e = sources.Tables.embeddings(spark, sf)
    val a = Clustering.kmeans(e, k = 8, iters = 2).cache()
    try {
      assert(a.count() === e.count(), "every vector gets exactly one cluster")
      assert(a.select(col("cid")).distinct().count() <= 8L)
      val again = Clustering.kmeans(e, k = 8, iters = 2)
        .select(col("vec_id"), col("cid"))
      assert(a.select(col("vec_id"), col("cid")).except(again).count() === 0L,
        "re-running the same fit must reproduce the same assignment")
    } finally a.unpersist()
  }

  test("assignment plan: broadcast crossJoin collapsed by partial min_by, no sort-merge join") {
    val df = Clustering.kmeans(sources.Tables.embeddings(spark, sf), k = 8, iters = 1)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroids must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join allowed:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "min_by must run partial (map-side) + final")
  }
}
