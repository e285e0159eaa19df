package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
import graft.QueryDef
import graft.sources.Tables

/** Distributed Lloyd's k-means over an embedding column — the "train"
  * step real IVF indexes run in front of list assignment (the repo's
  * `Similarity.ivfCentroids` hash-samples; production IVF trains
  * centroids first), and a standard curation primitive in its own
  * right: cluster-then-process is how large corpora get topic-sliced
  * and near-dup-pruned (SemDeDup-style) at 100 TB. Reference vector
  * index posture: `/root/reference/dbms/src/Storages/DeltaMerge/Index/
  * VectorIndex/Reader.h:34` (usearch HNSW — graph-based; k-means/IVF is
  * the Spark-native scale path per SURVEY §7.4.7).
  *
  * Scale shape per iteration: assignment is a broadcast crossJoin whose
  * N×k expansion collapses MAP-SIDE via min_by partial aggregation
  * (only N 1-row results shuffle); the centroid update posexplodes to
  * (cid, dim) pairs whose partial sums also combine map-side, so the
  * update shuffle is k·dims rows per task — both stages are
  * k-independent of corpus size in shuffle volume. Centroids stay
  * broadcastable for any k ≤ ~10⁶ at 64 dims.
  *
  * Determinism bridge for the DuckDB oracle: coordinates are quantized
  * to the 1e-6 grid up front (identical IEEE double multiply +
  * half-away-from-zero round in both engines), so per-cluster means
  * reduce to exact BIGINT sums divided by a count — no
  * float-summation-order divergence — and distance comparisons fold
  * identical doubles in ascending index order on both sides.
  */
object Clustering {
  private val dims = 64

  /** Ascending-index double fold of squared L2 distance (bit-identical
    * to the oracle's list_reduce; doubles, so it composes with the
    * quantized/averaged vectors the float-typed codegen vec_*
    * expressions can't take). */
  private def l2sq(a: Column, b: Column): Column =
    // r17: codegen fold kernel — same ascending-index double adds as
    // the interpreted aggregate(zip_with(...)) HOF it replaces
    // (bit-identical; VectorExpressionsSpec pins the equivalence)
    graft.functions.VectorFunctions.vec_l2sq_distance_d(a, b)

  /** Quantize to the 1e-6 grid: round(x·1e6)/1e6 as double. */
  def quantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000000.0) / 1000000.0).as("v"))

  /** Deterministic hash-sampled init — same key as `ivfCentroids`. */
  private def init(e: DataFrame, k: Int): DataFrame =
    e.orderBy((col("vec_id") % 1000003L) * 2654435761L % 4294967296L,
        col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** Collected (cid, cv) centroid rows — the same justified-collect
    * discipline the previous `materialized` LocalRelation used. NOTE
    * the practical k bound (ADVICE r17 #1): [[assignLocal]] inlines one
    * array literal + fold kernel per centroid into a single projection
    * with a k-ary `least`, so beyond k of a few THOUSAND the generated
    * code would blow janino/constant-pool limits and driver planning —
    * well before the collect itself hurts. Every caller here uses
    * k ≤ 32; a larger-k caller must chunk the least() fold or fall back
    * to the broadcast-join assignment shape this replaced. */
  private def centsOf(df: DataFrame): Array[(Long, Seq[Double])] =
    df.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Nearest-centroid assignment against DRIVER-LOCAL centroids as ONE
    * codegen projection (r17 optimization): the old shape was a
    * broadcast crossJoin (N×k expansion) re-collapsed by a min_by
    * groupBy — a broadcast exchange plus a corpus-wide aggregation
    * exchange per Lloyd round, and at bench scale most of each round's
    * wall was that plan's scheduling, not math. Folding the k (d, cid)
    * candidate structs with `least` computes the identical argmin in
    * the map stage: `least` orders structs lexicographically — exactly
    * min_by's struct(d, cid) key — and cids are distinct so there are
    * no ties; each distance is the same ascending-index l2sq fold
    * against the SAME centroid values (now array literals), so every
    * d is bit-identical. Shuffle volume per round drops from one
    * corpus-wide min_by exchange to ZERO. */
  def assignLocal(e: DataFrame, cents: Array[(Long, Seq[Double])]): DataFrame =
    if (cents.isEmpty)
      // empty corpus (init saw no rows): nothing to assign
      e.select(col("vec_id"), col("v"), lit(0L).as("cid"), lit(0.0).as("d"))
        .limit(0)
    else {
      val cand = cents.map { case (cid, cv) =>
        struct(l2sq(col("v"), typedLit(cv)).as("d"), lit(cid).as("cid"))
      }
      val best = if (cand.length == 1) cand.head else least(cand: _*)
      e.select(col("vec_id"), col("v"),
        best.getField("cid").as("cid"), best.getField("d").as("d"))
    }

  /** One Lloyd update: exact per-dimension mean of the quantized
    * coordinates (BIGINT sums / count — no float-order sensitivity).
    * Clusters that lose all members drop out, exactly as in the
    * oracle's GROUP BY. */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cid"), col("i"))
      .agg((sum(round(col("x") * 1000000.0).cast("long")).cast("double") /
        (count(lit(1)) * 1000000.0)).as("m"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("cv"))

  /** `iters` Lloyd updates from the hash-sampled init; returns the
    * trained centroids driver-side. Each round collects k rows (the
    * justified bounded materialization — it truncates the iteration
    * lineage so plan depth is constant in `iters` and an executor loss
    * never re-runs earlier rounds) and feeds the next round's
    * assignment as array literals via [[assignLocal]].
    *
    * The quantized corpus is read `iters + 1` times (init + one scan
    * per assignment round), so it is cached for the duration of
    * training and unpersisted before returning — the result has no
    * lineage back to it. */
  private[operators] def trainCents(e: DataFrame, k: Int,
      iters: Int): Array[(Long, Seq[Double])] = {
    val q = quantized(e).cache()
    try
      (0 until iters).foldLeft(centsOf(init(q, k))) { (c, _) =>
        centsOf(update(assignLocal(q, c)))
      }
    finally q.unpersist(blocking = true)
  }

  /** Trained centroids (cid, cv: array<double>) as a LocalRelation. */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = e.sparkSession
    val schema = StructType(Seq(
      StructField("cid", LongType, nullable = true),
      StructField("cv", ArrayType(DoubleType, containsNull = true),
        nullable = true)))
    val rows = trainCents(e, k, iters).map { case (cid, cv) =>
      org.apache.spark.sql.Row(cid, cv) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Trained centroids in the float-array shape `Similarity.ivfSearch`
    * consumes — k-means IS the IVF train step. */
  def kmeansCentroidsF(e: DataFrame, k: Int, iters: Int): DataFrame =
    kmeansCentroids(e, k, iters)
      .select(col("cid"), col("cv").cast("array<float>").as("cv"))

  /** `iters` Lloyd updates from the hash-sampled init; returns the
    * final assignment (vec_id, v, cid, d). */
  def kmeans(e: DataFrame, k: Int, iters: Int): DataFrame =
    assignLocal(quantized(e), trainCents(e, k, iters))

  private def duckL2Sq(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |  p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
       |     * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
       |  (u,v) -> u+v)""".stripMargin

  private def duckAssign(eRel: String, cRel: String): String =
    s"""SELECT vec_id, v, cid, d FROM (
       |  SELECT e.vec_id, e.v, c.cid, ${duckL2Sq("e.v", "c.cv")} AS d,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${duckL2Sq("e.v", "c.cv")}, c.cid) AS rn
       |  FROM $eRel e CROSS JOIN $cRel c) WHERE rn = 1""".stripMargin

  private def duckUpdate(aRel: String): String =
    s"""SELECT cid, list(m ORDER BY i) AS cv FROM (
       |  SELECT cid, i,
       |    CAST(SUM(CAST(round(v[i+1] * 1000000.0) AS BIGINT)) AS DOUBLE)
       |      / (COUNT(*) * 1000000.0) AS m
       |  FROM $aRel CROSS JOIN range($dims) t(i) GROUP BY cid, i)
       |GROUP BY cid""".stripMargin

  /** Two Lloyd iterations at k = 8 over the embeddings table; output is
    * the final hard assignment with its distance. The oracle replays
    * the identical iteration chain as CTEs. */
  val q131Kmeans: QueryDef = QueryDef(
    "q131_kmeans_embed",
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding,
       |      x -> round(CAST(x AS DOUBLE) * 1000000.0) / 1000000.0) AS v
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
       |       ORDER BY (vec_id % 1000003) * 2654435761 % 4294967296, vec_id
       |       LIMIT 8),
       |a0 AS (${duckAssign("e", "c0")}),
       |c1 AS (${duckUpdate("a0")}),
       |a1 AS (${duckAssign("e", "c1")}),
       |c2 AS (${duckUpdate("a1")}),
       |a2 AS (${duckAssign("e", "c2")})
       |SELECT vec_id, cid, round(sqrt(d), 6) AS dist FROM a2""".stripMargin) {
    (s, d) =>
      kmeans(Tables.embeddings(s, d), k = 8, iters = 2)
        .select(col("vec_id"), col("cid"),
          round(sqrt(col("d")), 6).as("dist"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding corpus with k-means, then
    * compare pairs ONLY within a cluster and flag every vector that has
    * a more-canonical (smaller vec_id) neighbor above the cosine
    * threshold — keeping one representative per semantic neighborhood.
    *
    * Scale shape: the pair join is cluster-local (joins on cid), so pair
    * count is Σ|cluster|²/2, and the SemDeDup operating regime keeps
    * |cluster| ≈ constant by scaling k with N (the paper uses k ≈ N/100
    * on 100M-scale corpora; our √N IVF rule gives the same bound) — the
    * join is a hash-partitioned equi-join on cid, never an all-pairs
    * product. The trained centroids arrive as a broadcast LocalRelation
    * from `kmeansCentroids`.
    *
    * Determinism: coordinates are lifted to the exact 1e-6 integer grid,
    * so dot products and norms are exact BIGINT folds (|x| ≤ 0.5 →
    * x²·10¹² ≤ 2.5·10¹¹, × 64 dims ≪ 2⁵³); the only float ops are two
    * correctly-rounded sqrts and one divide, bit-identical across
    * engines, and the 0.35 threshold compare sees identical doubles.
    */
  val q181SemDedup: QueryDef = QueryDef(
    "q181_semdedup",
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding,
       |      x -> round(CAST(x AS DOUBLE) * 1000000.0) / 1000000.0) AS v
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
       |       ORDER BY (vec_id % 1000003) * 2654435761 % 4294967296, vec_id
       |       LIMIT 8),
       |a0 AS (${duckAssign("e", "c0")}),
       |c1 AS (${duckUpdate("a0")}),
       |a1 AS (${duckAssign("e", "c1")}),
       |c2 AS (${duckUpdate("a1")}),
       |a2 AS (${duckAssign("e", "c2")}),
       |n AS (SELECT vec_id, cid,
       |        list_transform(v, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS iv
       |      FROM a2),
       |m AS (SELECT vec_id, cid, iv,
       |        list_reduce(list_transform(iv, x -> x * x), (u,w) -> u + w) AS n2
       |      FROM n),
       |dup AS (SELECT DISTINCT b.vec_id
       |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE CAST(list_reduce(list_transform(list_zip(a.iv, b.iv),
       |          q -> q[1] * q[2]), (u,w) -> u + w) AS DOUBLE)
       |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) >= 0.35)
       |SELECT vec_id, cid,
       |  CAST(CASE WHEN vec_id IN (SELECT vec_id FROM dup) THEN 1 ELSE 0 END
       |       AS BIGINT) AS is_dup
       |FROM m""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val a = assignLocal(quantized(e), trainCents(e, k = 8, iters = 2))
    val m = a.select(col("vec_id"), col("cid"),
        transform(col("v"), x => round(x * 1000000.0).cast("long")).as("iv"))
      .withColumn("n2",
        // r17: Σx² as the codegen integer dot of iv with itself —
        // identical wrapping long arithmetic to the interpreted fold
        graft.functions.VectorFunctions.vec_dot_long(col("iv"), col("iv")))
    val dot =
      graft.functions.VectorFunctions.vec_dot_long(col("a.iv"), col("b.iv"))
    val dup = m.as("a").join(m.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(dot.cast("double") /
        (sqrt(col("a.n2").cast("double")) * sqrt(col("b.n2").cast("double"))) >= 0.35)
      .select(col("b.vec_id").as("vec_id")).distinct()
    m.join(dup.withColumn("flag", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("flag"), lit(0L)).as("is_dup"))
  }

  val all: Seq[QueryDef] =
    // headline: the iterative broadcast-train shape (3 corpus passes +
    // 2 centroid updates) no other bench query represents
    Seq(q131Kmeans.copy(headline = true), q181SemDedup)
}
