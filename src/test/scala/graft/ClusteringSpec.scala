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

  test("k-means-trained centroids as the IVF train step on clustered data") {
    // same deterministic mixture fixture as the SimilaritySpec clustered
    // sweep: 8 well-separated clusters + hash noise. Hash-SAMPLED
    // centroids are arbitrary corpus points, so at k=8 their inverted
    // lists split clusters; TRAINED centroids converge toward the true
    // cluster centers and the single nearest list holds a query's whole
    // neighborhood — the faiss IVF posture.
    import spark.implicits._
    val dims = 16; val nClusters = 8; val n = 2000
    def noise(id: Long, j: Int): Float = {
      val h = ((id * 31 + j + 1) * 2654435761L) & 0xFFFFFFFFL
      (h / 4294967296.0 - 0.5).toFloat
    }
    val rows = (0L until n.toLong).map { id =>
      val c = (id % nClusters).toInt
      val emb = Array.tabulate(dims) { j =>
        (if (j % nClusters == c) 10.0f else 0.0f) + noise(id, j)
      }
      (id, emb)
    }
    val e = rows.toDF("vec_id", "embedding").repartition(8)
    def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(truth: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double =
      truth.keys.toSeq.map { q =>
        truth(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble / truth(q).size
      }.sum / truth.size
    val truth = topIds(operators.Similarity.ivfSearch(e, nProbe = 32))
    val trained = operators.Clustering.kmeansCentroidsF(e, k = 8, iters = 3)
    val rTrained = recall(truth,
      topIds(operators.Similarity.ivfSearch(e, nProbe = 1, nCentroids = 8,
        centroids = Some(trained))))
    val rSampled = recall(truth,
      topIds(operators.Similarity.ivfSearch(e, nProbe = 1, nCentroids = 8)))
    info(f"recall@10, probes=1, k=8: trained=$rTrained%.3f sampled=$rSampled%.3f")
    assert(rTrained >= rSampled - 1e-9,
      f"training must not hurt recall: trained $rTrained%.3f < sampled $rSampled%.3f")
    assert(rTrained >= 0.9,
      f"trained coarse quantizer should capture whole clusters: $rTrained%.3f")
  }

  test("centroid training truncates lineage: constant plan depth in iteration count") {
    // Each Lloyd round collects its k×dims centroids to a LocalRelation
    // (the Tokenizer.bpeTrain discipline), so the returned plan never
    // re-derives prior rounds — at 100 TB an executor loss must not
    // re-run the whole iteration chain, and plan depth must not grow
    // with `iters`.
    val e = sources.Tables.embeddings(spark, sf)
    def plan(iters: Int) =
      Clustering.kmeansCentroids(e, k = 4, iters = iters).queryExecution.optimizedPlan
    assert(plan(2).isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "trained centroids must be a materialized LocalRelation")
    val d1 = plan(1).treeString.linesIterator.size
    val d3 = plan(3).treeString.linesIterator.size
    assert(d3 === d1, s"plan depth grew with iterations: $d1 -> $d3")
  }

  test("semdedup keeps a representative per cluster and flags only within-cluster neighbors") {
    val out = Clustering.q181SemDedup.fn(spark, sf).cache()
    try {
      val total = out.count()
      assert(total === sources.Tables.embeddings(spark, sf).count(),
        "every vector is scored exactly once")
      // SemDeDup semantics: the smallest vec_id of each cluster can have
      // no smaller-id neighbor, so every cluster retains >= 1 survivor
      val perCluster = out.groupBy(col("cid"))
        .agg(sum(lit(1) - col("is_dup")).as("kept"))
        .collect()
      assert(perCluster.forall(_.getLong(1) >= 1L),
        "each cluster must keep at least one representative")
      assert(out.filter(col("is_dup") === 1L).count() < total,
        "the gate must not drop everything")
    } finally out.unpersist()
  }

  test("assignment plan: pure map-stage argmin — no join, no exchange, no aggregate") {
    // r17 optimization contract: nearest-centroid assignment against
    // driver-local centroids is ONE codegen projection (`least` over k
    // (d, cid) structs). The old shape — broadcast crossJoin collapsed
    // by a partial min_by — carried a broadcast exchange plus a
    // corpus-wide aggregation per Lloyd round; the new plan must carry
    // NEITHER. (ClusteringSpec's value tests pin output equality to
    // the oracle-replayed Lloyd chain, so the argmin itself is
    // semantics-checked elsewhere.)
    val df = Clustering.kmeans(sources.Tables.embeddings(spark, sf), k = 8, iters = 1)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"assignment must not join:\n$p")
    assert(!p.contains("Exchange"), s"assignment must not shuffle:\n$p")
    assert(!p.contains("Aggregate"), s"assignment must not aggregate:\n$p")
    assert(p.contains("vec_l2sq_distance_d"),
      s"distances must run the codegen fold kernel:\n$p")
  }

  // ---- PCA power iteration (q202) -----------------------------------

  test("PCA power iteration: Rayleigh objective is non-decreasing per round") {
    import graft.operators.Pca
    val cen = Pca.centeredGrid(sources.Tables.embeddings(spark, sf)).cache()
    try {
      val v1 = Pca.powerIteration(cen, 1)
      val v2 = Pca.powerIteration(cen, 2)
      val v3 = Pca.powerIteration(cen, 3)
      val (r1, r2, r3) =
        (Pca.rayleigh(cen, v1), Pca.rayleigh(cen, v2), Pca.rayleigh(cen, v3))
      assert(r2 >= r1, s"round 2 must not decrease the objective: $r1 -> $r2")
      assert(r3 >= r2, s"round 3 must not decrease the objective: $r2 -> $r3")
      // dominant direction beats every coordinate axis
      for (i <- Seq(0, 17, 63)) {
        val axis = Array.tabulate(64)(j => if (j == i) 1000000L else 0L)
        assert(r3 >= Pca.rayleigh(cen, axis),
          s"converged direction must dominate axis e_$i")
      }
    } finally cen.unpersist(blocking = false)
  }

  test("PCA power iteration recovers a planted dominant axis") {
    import graft.operators.Pca
    import spark.implicits._
    // points strung along a fixed unit direction (dims 3 and 7 mixed),
    // with small deterministic off-axis noise
    val axis = Array.tabulate(64)(i =>
      if (i == 3) 0.8 else if (i == 7) 0.6 else 0.0)
    val pts = (0 until 400).map { n =>
      val t = (n % 41) - 20.0 // spread -20..20
      val noise = 0.03 * ((n * 2654435761L % 97) - 48.0) / 48.0
      val v = Array.tabulate(64)(i =>
        (t * axis(i) + (if (i == (n % 64)) noise else 0.0)).toFloat)
      (n.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val cen = Pca.centeredGrid(pts)
    val v = Pca.powerIteration(cen, 3)
    val vd = v.map(_.toDouble / 1e6)
    val dot = vd.zip(axis).map { case (a, b) => a * b }.sum
    val nv = math.sqrt(vd.map(x => x * x).sum)
    assert(math.abs(dot) / nv > 0.99,
      s"|cos(recovered, planted)| = ${math.abs(dot) / nv} < 0.99")
  }

  test("PCA training is invariant to partition count") {
    import graft.operators.Pca
    val e = sources.Tables.embeddings(spark, sf)
    val a = Pca.powerIteration(Pca.centeredGrid(e.repartition(1)), 2)
    val b = Pca.powerIteration(Pca.centeredGrid(e.repartition(13)), 2)
    assert(a.toSeq === b.toSeq, "direction must be bit-identical at any partitioning")
  }
}
