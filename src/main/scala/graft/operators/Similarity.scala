package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the embedding column — the Spark analog of
  * the reference's vector index scan
  * (`/root/reference/dbms/src/Storages/DeltaMerge/Index/VectorIndex/Reader.h:34`,
  * metric map `CommonUtil.h:41-52`, pushdown
  * `Filter/PushDownExecutor.h:43-88`).
  *
  * Two paths, as the 100 TB design requires:
  *  - brute force: broadcast the (small) query set, one distributed
  *    scan of the embeddings, per-query top-k via window — correctness
  *    baseline, O(N·Q) but embarrassingly parallel, zero shuffle of the
  *    big side;
  *  - LSH-bucketed: deterministic random-hyperplane signatures, banded;
  *    candidates meet via a shuffle on (band, bucket) keys only — the
  *    scale path (the analog of the reference's HNSW-pruned scan).
  *
  * The DuckDB oracle recomputes distances with explicit double-cast
  * `list_reduce` folds (NOT `list_cosine_similarity`, which DuckDB
  * evaluates in float precision and would not bit-match).
  */
object Similarity {

  /** DuckDB fragment: ascending-index double fold, bit-identical to the
    * codegen loop in VecCosineDistance. */
  private[graft] def duckCosineDist(a: String, b: String): String =
    s"""1.0 - list_reduce(list_transform(list_zip($a, $b),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (u,v) -> u+v)
       |  / (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (u,v) -> u+v))
       |     * sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (u,v) -> u+v)))""".stripMargin

  /** Norm / dims projection — exercises the custom expressions. */
  val q50VecNorms: QueryDef = QueryDef(
    "q50_vec_norms",
    """SELECT vec_id, label,
      |  round(sqrt(list_reduce(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (u,v) -> u+v)), 6) AS l2norm,
      |  round(list_reduce(list_transform(embedding,
      |    x -> abs(CAST(x AS DOUBLE))), (u,v) -> u+v), 6) AS l1norm,
      |  CAST(len(embedding) AS BIGINT) AS dims
      |FROM embeddings""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d).select(
      col("vec_id"), col("label"),
      round(vec_l2_norm(col("embedding")), 6).as("l2norm"),
      round(aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
        lit(0.0), (acc, x) => acc + x), 6).as("l1norm"),
      size(col("embedding")).cast("long").as("dims"))
  }

  /** Brute-force cosine top-k for a small query set. */
  val q51KnnBrute: QueryDef = QueryDef(
    "q51_knn_bruteforce",
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
       |dists AS (
       |  SELECT q.qid, e.vec_id,
       |    ${duckCosineDist("q.qvec", "e.embedding")} AS dist
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vec_id, dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
       |  FROM dists)
       |SELECT qid, vec_id, rnk, round(dist, 6) AS dist
       |FROM ranked WHERE rnk <= 10""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dist", vec_cosine_distance(col("qvec"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id"), col("rnk"), round(col("dist"), 6).as("dist"))
  }.copy(headline = true)

  /** Brute-force KNN with per-partition partial top-k — the scale-safe
    * form of q51: each corpus partition keeps a bounded k-heap per
    * query (the one justified `mapPartitions` — per-partition
    * imperative state), so the shuffle carries ≤ partitions × |Q| × k
    * candidate rows instead of N × |Q|; a final window re-ranks the
    * tiny candidate set. Distances use the same ascending-index double
    * loop as the codegen expression, so results are bit-identical and
    * the oracle is the same as q51's. */
  val q51bKnnPartial: QueryDef = QueryDef(
    "q51b_knn_partial_topk",
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
       |dists AS (
       |  SELECT q.qid, e.vec_id,
       |    ${duckCosineDist("q.qvec", "e.embedding")} AS dist
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, vec_id, dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
       |  FROM dists)
       |SELECT qid, vec_id, rnk, round(dist, 6) AS dist
       |FROM ranked WHERE rnk <= 10""".stripMargin) { (s, d) =>
    import s.implicits._
    val k = 10
    val e = Tables.embeddings(s, d)
    // small query set pinned to the driver and shipped in the task
    // closure — the same "broadcast the queries" posture as q51
    val qs = e.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val candidates = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        // per-query bounded max-heap of (dist, vec_id); worst on top
        val ord = Ordering.Tuple2[Double, Long]
        val heaps = qs.map { case (qid, _) =>
          qid -> scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
        }.toMap
        it.foreach { case (vid, emb) =>
          qs.foreach { case (qid, qv) =>
            if (vid != qid) {
              val dTup = (cosDist(qv, emb), vid)
              val h = heaps(qid)
              if (h.size < k) h.enqueue(dTup)
              else if (ord.lt(dTup, h.head)) { h.dequeue(); h.enqueue(dTup) }
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (dist, vid) => (qid, vid, dist) }
        }
      }
      .toDF("qid", "vec_id", "dist")
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    candidates
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("rnk"), round(col("dist"), 6).as("dist"))
  }

  /** Filtered (hybrid) vector search — ANN combined with a scalar
    * predicate, the pattern the reference serves by pushing filters
    * INTO the vector index scan
    * (`/root/reference/dbms/src/Storages/DeltaMerge/Filter/PushDownExecutor.h:43-88`).
    * Semantics matter: this is a PRE-filter (predicate applied before
    * the top-k), which guarantees k results from the qualifying set —
    * post-filtering an unfiltered top-k would silently return fewer
    * than k. Spark-native: the label predicate prunes at the parquet
    * scan (PushedFilters) BEFORE the distance evaluation, so the
    * filtered corpus is never fully materialized. */
  val q51cKnnFiltered: QueryDef = QueryDef(
    "q51c_knn_filtered",
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
       |dists AS (
       |  SELECT q.qid, e.vec_id,
       |    ${duckCosineDist("q.qvec", "e.embedding")} AS dist
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> q.qid AND e.label = 3),
       |ranked AS (
       |  SELECT qid, vec_id, dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
       |  FROM dists)
       |SELECT qid, vec_id, rnk, round(dist, 6) AS dist
       |FROM ranked WHERE rnk <= 10""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    e.filter(col("label") === 3) // pre-filter: pushed to the scan
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dist", vec_cosine_distance(col("qvec"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id"), col("rnk"), round(col("dist"), 6).as("dist"))
  }

  /** All four distance metrics side by side on aligned pairs. */
  val q52VecMetrics: QueryDef = QueryDef(
    "q52_vec_metrics",
    s"""SELECT a.vec_id,
       |  round(list_reduce(list_transform(list_zip(a.embedding, b.embedding),
       |    p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (u,v) -> u+v), 6) AS l1,
       |  round(sqrt(list_reduce(list_transform(list_zip(a.embedding, b.embedding),
       |    p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
       |    (u,v) -> u+v)), 6) AS l2,
       |  round(-list_reduce(list_transform(list_zip(a.embedding, b.embedding),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (u,v) -> u+v), 6) AS nip,
       |  round(${duckCosineDist("a.embedding", "b.embedding")}, 6) AS cosd
       |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 7""".stripMargin) {
    (s, d) =>
      val e = Tables.embeddings(s, d)
      val a = e.select(col("vec_id"), col("embedding"))
      val b = e.select((col("vec_id") - 7).as("join_id"), col("embedding").as("emb2"))
      a.join(b, col("vec_id") === col("join_id"))
        .select(
          col("vec_id"),
          round(vec_l1_distance(col("embedding"), col("emb2")), 6).as("l1"),
          round(vec_l2_distance(col("embedding"), col("emb2")), 6).as("l2"),
          round(vec_negative_inner_product(col("embedding"), col("emb2")), 6).as("nip"),
          round(vec_cosine_distance(col("embedding"), col("emb2")), 6).as("cosd"))
  }

  /** DuckDB fragment: squared-L2 fold over two list expressions —
    * duckL2Dist without the sqrt (ADC sums per-subvector squares). */
  private def duckL2Sq(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |  p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
       |  (u,v) -> u+v)""".stripMargin

  /** Product quantization (PQ) with asymmetric-distance search (ADC) —
    * the compression technique that makes a 10¹¹-vector index
    * RAM-resident (FAISS IVFPQ practice; the reference's vector index
    * holds full vectors, `Index/VectorIndex/Reader.h:34`, so PQ is the
    * beyond-reference scale path): each 64-dim vector is encoded as
    * M=4 sub-codes from 16-entry per-subspace codebooks — 4 bytes in
    * place of 256, a 64× compression — and a query ranks candidates by
    * the SUM of per-subspace table-lookup distances without touching
    * the raw vectors.
    *
    * Deterministic construction keeps it fully oracled: codebooks are
    * the same Knuth-hash sample as the IVF centroids (sliced per
    * subspace), encode is a min_by argmin per (vector, subspace) that
    * collapses map-side (N×M×16 expansion never shuffles), the
    * distance lookup table is |Q|·M·16 ≈ 320 doubles broadcast, and
    * the final ADC adds the M partial distances in FIXED order
    * (ld0+ld1)+ld2)+ld3 so both engines produce bit-identical doubles.
    * At 100 TB: codes are a 4-byte-per-vector table, the rank window
    * would ride the q51b per-partition bounded-heap form. */
  val q56AnnPq: QueryDef = QueryDef(
    "q56_ann_pq",
    s"""WITH cb16 AS (SELECT vec_id AS code_vec, embedding AS cv FROM embeddings
       |              ORDER BY (vec_id % 1000003) * 2654435761 % 4294967296, vec_id LIMIT 16),
       |ms AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(m)),
       |cb AS (SELECT m, code_vec, list_slice(cv, m*16+1, m*16+16) AS cvm
       |       FROM cb16 CROSS JOIN ms),
       |enc0 AS (
       |  SELECT e.vec_id, cb.m, cb.code_vec,
       |    sqrt(${duckL2Sq("list_slice(e.embedding, cb.m*16+1, cb.m*16+16)", "cb.cvm")}) AS d
       |  FROM embeddings e CROSS JOIN cb),
       |enc AS (SELECT vec_id, m, code_vec AS code FROM (
       |  SELECT vec_id, m, code_vec,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d, code_vec) AS rn
       |  FROM enc0) WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |lut AS (SELECT q.qid, cb.m, cb.code_vec,
       |    ${duckL2Sq("list_slice(q.qv, cb.m*16+1, cb.m*16+16)", "cb.cvm")} AS ld
       |  FROM q CROSS JOIN cb),
       |adc0 AS (SELECT l.qid, enc.vec_id,
       |    MAX(CASE WHEN enc.m = 0 THEN ld END) AS ld0,
       |    MAX(CASE WHEN enc.m = 1 THEN ld END) AS ld1,
       |    MAX(CASE WHEN enc.m = 2 THEN ld END) AS ld2,
       |    MAX(CASE WHEN enc.m = 3 THEN ld END) AS ld3
       |  FROM enc JOIN lut l ON enc.m = l.m AND enc.code = l.code_vec
       |  GROUP BY l.qid, enc.vec_id),
       |adc AS (SELECT qid, vec_id, ((ld0 + ld1) + ld2) + ld3 AS dist
       |        FROM adc0 WHERE vec_id <> qid),
       |ranked AS (SELECT qid, vec_id, dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk FROM adc)
       |SELECT qid, vec_id, rnk, round(dist, 6) AS dist
       |FROM ranked WHERE rnk <= 10""".stripMargin) { (s, d) =>
    pqSearch(Tables.embeddings(s, d))
  }

  /** The PQ/ADC pipeline (M subspaces × 16 codes, see q56). The ADC
    * pivot and the fixed-order distance sum are derived from `mSub`,
    * so any (mSub, subDim) factorization of the embedding dimension
    * is exact; the left-to-right add order keeps doubles bit-stable. */
  /** PQ codebook: 16 hash-sampled code vectors × mSub subspace slices
    * (m, start, code_vec, cvm) — broadcast-sized at any corpus scale. */
  def pqCodebook(e: DataFrame, mSub: Int = 4, subDim: Int = 16): DataFrame = {
    require(mSub * subDim == embedDims,
      s"mSub*subDim must cover the $embedDims-dim embeddings, got $mSub*$subDim")
    val session = e.sparkSession
    import session.implicits._
    val cb16 = e.select(col("vec_id").as("code_vec"), col("embedding").as("cv"))
      .orderBy((col("code_vec") % 1000003L) * 2654435761L % 4294967296L, col("code_vec"))
      .limit(16)
    val ms = (0 until mSub).map(m => (m, m * subDim + 1)).toDF("m", "start")
    cb16.crossJoin(ms)
      .select(col("m"), col("start"), col("code_vec"),
        slice(col("cv"), col("start"), lit(subDim)).as("cvm"))
  }

  /** PQ encode: argmin code per (vector, subspace); the N×M×16
    * expansion collapses in the map-side partial min_by — only N×M
    * code rows move. */
  def pqCodes(e: DataFrame, cb: DataFrame, subDim: Int = 16): DataFrame =
    e.crossJoin(broadcast(cb))
      .withColumn("d",
        vec_l2_distance(slice(col("embedding"), col("start"), lit(subDim)), col("cvm")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("code_vec"), struct(col("d"), col("code_vec"))).as("code"))

  def pqSearch(e: DataFrame, mSub: Int = 4, subDim: Int = 16, k: Int = 10): DataFrame = {
    val cb = pqCodebook(e, mSub, subDim)
    val enc = pqCodes(e, cb, subDim)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // distance lookup table: |Q|·M·16 squared sub-distances, ascending
    // fold in doubles (bit-identical to the oracle's list_reduce)
    // r17: codegen sub-distance kernel — same ascending-index
    // double fold as the interpreted zip_with it replaces
    val ld = graft.functions.VectorFunctions.vec_l2sq_distance_f(
      slice(col("qv"), col("start"), lit(subDim)), col("cvm"))
    val lut = q.crossJoin(cb)
      .select(col("qid"), col("m").as("lm"), col("code_vec"), ld.as("ld"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    val ldCols = (0 until mSub).map(m => max(when(col("m") === m, col("ld"))).as(s"ld$m"))
    enc.join(broadcast(lut),
        col("m") === col("lm") && col("code") === col("code_vec"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(ldCols.head, ldCols.tail: _*)
      .withColumn("dist", (0 until mSub).map(m => col(s"ld$m")).reduce(_ + _))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("rnk"), round(col("dist"), 6).as("dist"))
  }

  // ------------------------------------------------------------ LSH
  /** Signed random projection: deterministic ±1 hyperplane weights from
    * xxhash64(dim_index, plane_id); one bucket id per band of `bits`
    * planes. No oracle — not ANSI-SQL-expressible (xxhash64).
    */
  private def bandBucket(vec: Column, band: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      val plane = band * bits + b
      val proj = aggregate(
        transform(vec, (x, i) =>
          x.cast("double") *
            (pmod(xxhash64(i, lit(plane)), lit(2)) * 2 - 1).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, 1L << b).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** LSH-bucketed ANN: the 100 TB path. Signatures are computed in one
    * distributed pass; candidates meet through an equi-join on
    * (band, bucket) — shuffle volume is |candidates|, never N×Q. */
  val q53AnnLsh: QueryDef = QueryDef.noOracle("q53_ann_lsh") { (s, d) =>
    val nBands = 3; val bits = 6
    val e = Tables.embeddings(s, d)
    def withBuckets(df: DataFrame, vecCol: String): DataFrame = {
      val bands = array((0 until nBands).map(bd =>
        struct(lit(bd).as("band"), bandBucket(col(vecCol), bd, bits).as("bucket"))): _*)
      val cols = df.columns.toIndexedSeq.map(col) :+
        col("bb.band").as("band") :+ col("bb.bucket").as("bucket")
      df.withColumn("bb", explode(bands)).select(cols: _*)
    }
    val base = withBuckets(e, "embedding")
    val qs = withBuckets(
      e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      "qvec")
    val cands = base.join(qs, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("qvec"), col("embedding"))
      .distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    cands
      .withColumn("dist", vec_cosine_distance(col("qvec"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id"), col("rnk"), round(col("dist"), 6).as("dist"))
  }

  /** Deterministic coarse projection bit for blocking: sign of the
    * inner product with a fixed ±1 weight pattern over the 64 dims —
    * computed through the codegen VecNegativeInnerProduct (no
    * interpreted HOF in the per-row hot path). The DuckDB oracle
    * recomputes the identical ascending-index double fold. */
  private val embedDims = 64
  private def signedProj(vec: Column, w: Int => Double): Column =
    -vec_negative_inner_product(vec,
      array((0 until embedDims).map(i => lit(w(i).toFloat)): _*))

  private def duckSignedProj(col: String, weightCase: String): String =
    s"""list_reduce(list_transform(range(0, len($col)),
       |  i -> CAST($col[i+1] AS DOUBLE) * ($weightCase)), (a,b) -> a+b)""".stripMargin

  /** Embedding-cosine near-duplicate pairs through the SAME bounded
    * blocking shape as q61/q63/q69: block key = (label, 4 coarse
    * sign-projection bits), buckets capped at 32 members — pair output
    * is bounded at cap²/2 per bucket regardless of corpus size, where
    * the former label-only block grew quadratically within each label.
    * Blocking is inherently recall-trading (like the reference's
    * ANN index pruning); the oracle spells the identical blocking. */
  val q54EmbedNearDup: QueryDef = QueryDef(
    "q54_embed_neardup",
    s"""WITH t AS (
       |  SELECT vec_id, label, embedding,
       |    ${duckSignedProj("embedding", "1.0")} AS p0,
       |    ${duckSignedProj("embedding", "CASE WHEN i % 2 = 0 THEN 1.0 ELSE -1.0 END")} AS p1,
       |    ${duckSignedProj("embedding", "CASE WHEN i < 32 THEN 1.0 ELSE -1.0 END")} AS p2,
       |    ${duckSignedProj("embedding", "CASE WHEN i % 4 < 2 THEN 1.0 ELSE -1.0 END")} AS p3
       |  FROM embeddings),
       |b AS (SELECT vec_id, embedding,
       |        label || ':' || CAST(CAST(p0 > 0 AS INT) AS VARCHAR)
       |          || CAST(CAST(p1 > 0 AS INT) AS VARCHAR)
       |          || CAST(CAST(p2 > 0 AS INT) AS VARCHAR)
       |          || CAST(CAST(p3 > 0 AS INT) AS VARCHAR) AS blk
       |      FROM t),
       |c AS (SELECT blk FROM b GROUP BY blk HAVING COUNT(*) BETWEEN 2 AND 32)
       |SELECT a.vec_id AS id1, b2.vec_id AS id2,
       |  round(1.0 - (${duckCosineDist("a.embedding", "b2.embedding")}), 6) AS sim
       |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.vec_id < b2.vec_id
       |JOIN c ON c.blk = a.blk
       |WHERE 1.0 - (${duckCosineDist("a.embedding", "b2.embedding")}) > 0.2""".stripMargin) {
    (s, d) =>
      val e = Tables.embeddings(s, d)
      val bits = Seq[Int => Double](
        _ => 1.0,
        i => if (i % 2 == 0) 1.0 else -1.0,
        i => if (i < embedDims / 2) 1.0 else -1.0,
        i => if (i % 4 < 2) 1.0 else -1.0)
      val blk = concat((col("label").cast("string") +: lit(":") +:
        bits.map(w => (signedProj(col("embedding"), w) > 0).cast("int").cast("string"))): _*)
      val t = e.select(col("vec_id").as("doc_id"), col("embedding").as("payload"), blk.as("blk"))
      TextPipeline.boundedPairs(t, 32)
        .withColumn("sim", lit(1.0) - vec_cosine_distance(col("p1"), col("p2")))
        .filter(col("sim") > 0.2)
        .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
  }

  private[graft] def duckL2Dist(a: String, b: String): String =
    s"""sqrt(list_reduce(list_transform(list_zip($a, $b),
       |  p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
       |  (u,v) -> u+v))""".stripMargin

  /** IVF-style ANN: a coarse quantizer partitions the corpus into
    * inverted lists; a query probes only its nProbe nearest lists. The
    * centroids are a deterministic k-sample — the k rows minimizing a
    * Knuth multiplicative hash of vec_id, i.e. a uniform pseudo-random
    * draw both engines compute identically (production would k-means
    * the same sample). Cost model: assignment is O(N·k) broadcast work,
    * each inverted list holds ~N/k rows, so a probe scans
    * ~nProbe · N/k rows — k must GROW with the corpus or probe cost
    * degenerates to O(N). The standard sizing is k ≈ √N (FAISS/IVFADC
    * practice): at N = 10¹¹ that is ~316k centroids ≈ 80 MB of 64-dim
    * floats — still comfortably broadcast-able, and probe cost then
    * scales as nProbe·√N. q58 is oracled at the small-SF operating
    * point k=32; the SimilaritySpec sweep also runs k=64 to prove
    * assignment and recall behave as k scales. At 100 TB the
    * assignment is one broadcast-join pass, the index is a
    * cid-partitioned table, and query cost is |probed lists| not
    * |corpus|. Deterministic math end to end, so unlike LSH this
    * variant is fully oracled. */
  /** IVF centroids: the k smallest Knuth-hash values of vec_id
    * → TakeOrderedAndProject (a bounded top-k, never a full sort). The
    * pre-modulo keeps the product < 2^52 so ANSI-mode Spark and DuckDB
    * agree exactly. */
  def ivfCentroids(e: DataFrame, k: Int = 32): DataFrame =
    e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .orderBy((col("cid") % 1000003L) * 2654435761L % 4294967296L, col("cid"))
      .limit(k)

  /** Nearest-centroid assignment as a min_by AGGREGATION, not a window:
    * the N×C expansion collapses map-side (partial min_by) so only N
    * rows shuffle — a window would shuffle all N×C expanded rows.
    * (cdist, cid) lexicographic min ≙ ORDER BY dist, cid. */
  def ivfAssign(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent))
      .withColumn("cdist", vec_l2_distance(col("embedding"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("cid"), struct(col("cdist"), col("cid"))).as("cid"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("cid"))

  val q58AnnIvf: QueryDef = QueryDef(
    "q58_ann_ivf",
    s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |              ORDER BY (vec_id % 1000003) * 2654435761 % 4294967296, vec_id LIMIT 32),
       |assign AS (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${duckL2Dist("e.embedding", "c.cv")}, c.cid) AS rn
       |  FROM embeddings e CROSS JOIN cent c),
       |a2 AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |probe AS (
       |  SELECT q.qid, q.qv, c.cid,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY ${duckL2Dist("q.qv", "c.cv")}, c.cid) AS rn
       |  FROM q CROSS JOIN cent c),
       |p2 AS (SELECT qid, qv, cid FROM probe WHERE rn <= 4),
       |cand AS (SELECT p2.qid, a2.vec_id, p2.qv, a2.embedding
       |         FROM p2 JOIN a2 USING (cid) WHERE a2.vec_id <> p2.qid),
       |ranked AS (
       |  SELECT qid, vec_id,
       |    ${duckCosineDist("qv", "embedding")} AS dist,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY ${duckCosineDist("qv", "embedding")}, vec_id) AS rnk
       |  FROM cand)
       |SELECT qid, vec_id, rnk, round(dist, 6) AS dist
       |FROM ranked WHERE rnk <= 10""".stripMargin) { (s, d) =>
    ivfSearch(Tables.embeddings(s, d), nProbe = 4)
  }

  /** The IVF probe path with configurable probe and centroid counts —
    * q58 runs it at (nProbe=4, nCentroids=32); the recall-sweep
    * contract test (`SimilaritySpec`) sweeps probes against the q51
    * brute-force truth and repeats the sweep at nCentroids=64 (the
    * √N-rule scaling direction). */
  def ivfSearch(e: DataFrame, nProbe: Int, k: Int = 10, nCentroids: Int = 32,
      centroids: Option[DataFrame] = None): DataFrame = {
    // default coarse quantizer is the hash sample; callers can pass
    // k-means-trained centroids (Clustering.kmeansCentroidsF) — the
    // faiss-style IVF train step — for better list balance and recall
    val cent = centroids.getOrElse(ivfCentroids(e, nCentroids))
    val assigned = ivfAssign(e, cent)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cid"))
    val probed = q.crossJoin(broadcast(cent))
      .withColumn("cdist", vec_l2_distance(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))
    val wRank = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    // probe set is tiny (|Q| × nProbe) — broadcast it so the corpus-side
    // inverted lists never shuffle (static planner picked SMJ here)
    broadcast(probed).join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dist", vec_cosine_distance(col("qv"), col("embedding")))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("rnk"), round(col("dist"), 6).as("dist"))
  }

  /** Fused IVF → PQ-ADC → exact re-rank retrieval — the complete
    * faiss "IVFADC + refine" pipeline SURVEY §2.8 names as the scale
    * path for the reference's HNSW index
    * (`/root/reference/dbms/src/Storages/DeltaMerge/Index/VectorIndex/Reader.h:34`):
    * the coarse quantizer prunes the corpus to nProbe inverted lists,
    * PQ asymmetric distance scores ONLY the probed candidates from
    * 8-byte codes (no full vectors touched), and just the ADC top-R
    * (R = 50) re-rank against exact vectors for the final top-10.
    *
    * Scale shape: centroids and PQ codebook are broadcast-sized
    * (√N-rule centroids ≈ 80 MB at N = 10¹¹, codebook KBs); the
    * corpus pays one assignment pass and one encode pass (both
    * map-side-collapsed min_by); a query reads nProbe·N/k code rows
    * and exactly R full vectors. Deterministic math end to end — fully
    * oracled, like q56/q58 but composed.
    */
  val q218IvfPqRerank: QueryDef = QueryDef(
    "q218_ivfpq_rerank",
    s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |              ORDER BY (vec_id % 1000003) * 2654435761 % 4294967296, vec_id LIMIT 32),
       |assign AS (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${duckL2Dist("e.embedding", "c.cv")}, c.cid) AS rn
       |  FROM embeddings e CROSS JOIN cent c),
       |a2 AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |probe AS (
       |  SELECT q.qid, q.qv, c.cid,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY ${duckL2Dist("q.qv", "c.cv")}, c.cid) AS rn
       |  FROM q CROSS JOIN cent c),
       |p2 AS (SELECT qid, qv, cid FROM probe WHERE rn <= 4),
       |cand AS (SELECT p2.qid, a2.vec_id FROM p2 JOIN a2 USING (cid)
       |         WHERE a2.vec_id <> p2.qid),
       |cb16 AS (SELECT vec_id AS code_vec, embedding AS cv FROM embeddings
       |         ORDER BY (vec_id % 1000003) * 2654435761 % 4294967296, vec_id LIMIT 16),
       |ms AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(m)),
       |cb AS (SELECT m, code_vec, list_slice(cv, m*16+1, m*16+16) AS cvm
       |       FROM cb16 CROSS JOIN ms),
       |enc0 AS (
       |  SELECT e.vec_id, cb.m, cb.code_vec,
       |    sqrt(${duckL2Sq("list_slice(e.embedding, cb.m*16+1, cb.m*16+16)", "cb.cvm")}) AS d
       |  FROM embeddings e CROSS JOIN cb),
       |enc AS (SELECT vec_id, m, code_vec AS code FROM (
       |  SELECT vec_id, m, code_vec,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d, code_vec) AS rn
       |  FROM enc0) WHERE rn = 1),
       |lut AS (SELECT q.qid, cb.m, cb.code_vec,
       |    ${duckL2Sq("list_slice(q.qv, cb.m*16+1, cb.m*16+16)", "cb.cvm")} AS ld
       |  FROM q CROSS JOIN cb),
       |adc0 AS (SELECT l.qid, enc.vec_id,
       |    MAX(CASE WHEN enc.m = 0 THEN ld END) AS ld0,
       |    MAX(CASE WHEN enc.m = 1 THEN ld END) AS ld1,
       |    MAX(CASE WHEN enc.m = 2 THEN ld END) AS ld2,
       |    MAX(CASE WHEN enc.m = 3 THEN ld END) AS ld3
       |  FROM enc JOIN lut l ON enc.m = l.m AND enc.code = l.code_vec
       |  JOIN cand c ON c.qid = l.qid AND c.vec_id = enc.vec_id
       |  GROUP BY l.qid, enc.vec_id),
       |adc AS (SELECT qid, vec_id, ((ld0 + ld1) + ld2) + ld3 AS adist FROM adc0),
       |topr AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rn
       |  FROM adc) WHERE rn <= 50),
       |rer AS (SELECT t.qid, t.vec_id,
       |    ${duckL2Dist("q.qv", "e.embedding")} AS dist
       |  FROM topr t JOIN q ON q.qid = t.qid
       |  JOIN embeddings e ON e.vec_id = t.vec_id),
       |ranked AS (SELECT qid, vec_id, dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
       |  FROM rer)
       |SELECT qid, vec_id, rnk, round(dist, 6) AS dist
       |FROM ranked WHERE rnk <= 10""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val cent = ivfCentroids(e, 32)
    val assigned = ivfAssign(e, cent)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cid"))
    val probed = q.crossJoin(broadcast(cent))
      .withColumn("cdist", vec_l2_distance(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 4)
      .select(col("qid"), col("cid"))
    // candidate (qid, vec_id) pairs: the probed inverted lists only
    val cand = broadcast(probed)
      .join(assigned.select(col("vec_id"), col("cid")), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    // PQ: codebook broadcast, corpus encoded once, |Q|-sized LUT
    val cb = pqCodebook(e)
    val enc = pqCodes(e, cb)
    // r17: codegen sub-distance kernel (see pqSearch)
    val ld = graft.functions.VectorFunctions.vec_l2sq_distance_f(
      slice(col("qv"), col("start"), lit(16)), col("cvm"))
    val lut = q.crossJoin(cb)
      .select(col("qid").as("lqid"), col("m").as("lm"),
        col("code_vec"), ld.as("ld"))
    val ldCols = (0 until 4).map(m => max(when(col("lm") === m, col("ld"))).as(s"ld$m"))
    // ADC over candidate code rows only — no full vectors move here
    val adc = cand.join(enc, "vec_id")
      .join(broadcast(lut),
        col("m") === col("lm") && col("code") === col("code_vec") &&
          col("qid") === col("lqid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(ldCols.head, ldCols.tail: _*)
      .withColumn("adist", (0 until 4).map(m => col(s"ld$m")).reduce(_ + _))
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    val topR = adc.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= 50).select(col("qid"), col("vec_id"))
    // refine: exact vectors ONLY for the R survivors per query
    val wRank = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    topR.join(e, "vec_id").join(broadcast(q), "qid")
      .withColumn("dist", vec_l2_distance(col("qv"), col("embedding")))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id"), col("rnk"),
        round(col("dist"), 6).as("dist"))
  }

  /** Hybrid retrieval with reciprocal-rank fusion: the BM25 lexical
    * top-20 (q75b's math, fixed-order term sums) fused with the
    * embedding-cosine top-20 (query = vec 0, broadcast) by
    * RRF(d) = Σ 1/(60 + rank_leg(d)) — the standard hybrid-search
    * combiner. Scores are exact integer ppm (1000000 div (60+rank)),
    * so the fusion ordering is engine-independent. Scale: each leg ends
    * in TakeOrderedAndProject (bounded 20-row candidate sets); the rank
    * windows and the full-outer fusion join run over those 20-row sets
    * only — corpus cost is one token shuffle + one broadcast scan. */
  val q187HybridRrf: QueryDef = QueryDef(
    "q187_hybrid_rrf",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM documents),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |              CAST(SUM(dl) AS BIGINT) AS total FROM dl),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       |       WHERE term IN ('hash', 'join', 'scan') GROUP BY doc_id, term),
       |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |co AS (SELECT tf.doc_id, tf.term,
       |         ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1)
       |           * (tf.tf * 2.2)
       |           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
       |                / (CAST(st.total AS DOUBLE) / st.n))) AS c
       |       FROM tf JOIN df ON tf.term = df.term
       |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
       |bm AS (SELECT doc_id,
       |  round(COALESCE(SUM(CASE WHEN term = 'hash' THEN c END), 0)
       |      + COALESCE(SUM(CASE WHEN term = 'join' THEN c END), 0)
       |      + COALESCE(SUM(CASE WHEN term = 'scan' THEN c END), 0), 6) AS bm25
       |  FROM co GROUP BY doc_id),
       |brank AS (SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rb
       |  FROM bm QUALIFY rb <= 20),
       |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
       |dist AS (SELECT e.vec_id,
       |    ${duckCosineDist("q.qvec", "e.embedding")} AS dist
       |  FROM embeddings e CROSS JOIN q),
       |vrank AS (SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY dist, vec_id) AS INTEGER) AS rv
       |  FROM dist QUALIFY rv <= 20)
       |SELECT COALESCE(b.doc_id, v.vec_id) AS doc_id,
       |  COALESCE(b.rb, 0) AS rb, COALESCE(v.rv, 0) AS rv,
       |  CAST(CASE WHEN b.rb IS NULL THEN 0 ELSE 1000000 // (60 + b.rb) END
       |     + CASE WHEN v.rv IS NULL THEN 0 ELSE 1000000 // (60 + v.rv) END
       |    AS BIGINT) AS rrf_ppm
       |FROM brank b FULL OUTER JOIN vrank v ON b.doc_id = v.vec_id
       |ORDER BY rrf_ppm DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // ---- lexical leg (q75b's BM25, top-20) ----
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val st = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("total"))
    val tf = tok.filter(col("term").isin("hash", "join", "scan"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
      (col("tf") * 2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") /
        (col("total").cast("double") / col("n"))))
    def termSum(t: String) =
      coalesce(sum(when(col("term") === t, col("c"))), lit(0.0))
    val bm = tf.join(broadcast(dft), "term").join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .select(col("doc_id"), col("term"), contrib.as("c"))
      .groupBy(col("doc_id"))
      .agg(round(termSum("hash") + termSum("join") + termSum("scan"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
    val brank = bm.withColumn("rb",
      row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("int"))
      .select(col("doc_id"), col("rb"))
    // ---- vector leg (cosine to vec 0, top-20) ----
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val vtop = e.crossJoin(broadcast(q))
      .withColumn("dist", vec_cosine_distance(col("qvec"), col("embedding")))
      .orderBy(col("dist"), col("vec_id")).limit(20)
    val vrank = vtop.withColumn("rv",
      row_number().over(Window.orderBy(col("dist"), col("vec_id"))).cast("int"))
      .select(col("vec_id"), col("rv"))
    // ---- fusion over the two bounded 20-row sets ----
    brank.join(vrank, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        coalesce(col("rb"), lit(0)).as("rb"),
        coalesce(col("rv"), lit(0)).as("rv"),
        (when(col("rb").isNull, 0L)
          .otherwise(expr("1000000L div (60 + rb)")) +
         when(col("rv").isNull, 0L)
          .otherwise(expr("1000000L div (60 + rv)"))).cast("long").as("rrf_ppm"))
      .orderBy(col("rrf_ppm").desc, col("doc_id")).limit(10)
  }

  /** Programmatically unrolled oracle for q236: round r's candidates
    * exclude sel_r = p1 ∪ … ∪ p(r−1) and subtract the max similarity
    * to any selected vector — the identical iteration chain as CTEs
    * (the q202 oracle discipline for driver-bounded iterative ops). */
  private def mmrOracle(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
              |q AS (SELECT embedding AS qv FROM e WHERE vec_id = 0),
              |rel AS (SELECT e.vec_id, e.embedding,
              |    1.0 - (${duckCosineDist("e.embedding", "q.qv")}) AS rel
              |  FROM e, q WHERE e.vec_id <> 0),
              |p1 AS (SELECT vec_id, embedding, rel AS score FROM rel
              |       ORDER BY rel DESC, vec_id LIMIT 1)""".stripMargin
    for (r <- 2 to k) {
      val selUnion = (1 until r)
        .map(i => s"SELECT vec_id, embedding FROM p$i").mkString(" UNION ALL ")
      sb ++= s""",
                |sel$r AS ($selUnion),
                |c$r AS (SELECT r.vec_id, r.embedding,
                |    CAST(0.7 AS DOUBLE) * r.rel - CAST(0.3 AS DOUBLE)
                |      * MAX(1.0 - (${duckCosineDist("r.embedding", "s.embedding")})) AS score
                |  FROM rel r, sel$r s
                |  WHERE r.vec_id NOT IN (SELECT vec_id FROM sel$r)
                |  GROUP BY r.vec_id, r.embedding, r.rel),
                |p$r AS (SELECT vec_id, embedding, score FROM c$r
                |        ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    }
    sb ++= "\n" + (1 to k)
      .map(r => s"SELECT $r AS rk, vec_id, round(score, 6) AS mmr6 FROM p$r")
      .mkString("\nUNION ALL ")
    sb.toString
  }

  /** Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    * 1998): greedily pick the candidate maximizing
    * λ·rel(q, v) − (1−λ)·max_{s∈S} sim(v, s) — the diversity-aware
    * retrieval head a dedup-conscious RAG pipeline runs instead of
    * plain top-k. λ = 0.7, k = 5, query = vector 0, cosine throughout.
    *
    * Scale shape: the kmeans/PCA driver-bounded-iteration discipline —
    * the relevance frame is computed ONCE and cached for the k rounds
    * (released in finally, blocking); each round is one corpus pass
    * (cross join against the ≤ k-row broadcast selected set, map-side
    * max) collapsing to ONE collected row; the result is k local rows
    * with no lineage. Floats follow the q51 bit-parity convention
    * (identical IEEE cosine sequence both engines; ranking on raw
    * doubles; rounding only at output). */
  val q236MmrTopk: QueryDef = QueryDef(
    "q236_mmr_topk", mmrOracle(5)) { (s, d) =>
    import s.implicits._
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val qRow = e.filter(col("vec_id") === 0).select(col("embedding")).take(1)
    if (qRow.isEmpty) {
      Seq.empty[(Int, Long, Double)].toDF("rk", "vec_id", "mmr6")
    } else {
      val qdf = broadcast(Seq(Tuple1(qRow(0).getSeq[Float](0).toArray))
        .toDF("qv"))
      val rel = e.filter(col("vec_id") =!= 0).crossJoin(qdf)
        .select(col("vec_id"), col("embedding"),
          (lit(1.0) - vec_cosine_distance(col("embedding"), col("qv"))).as("rel"))
        .cache()
      try {
        var selected = Vector.empty[(Int, Long, Double, Array[Float])]
        var exhausted = false
        while (selected.size < 5 && !exhausted) {
          val rk = selected.size + 1
          val picked =
            if (selected.isEmpty)
              rel.orderBy(col("rel").desc, col("vec_id")).limit(1)
                .select(col("vec_id"), col("rel").as("score"), col("embedding"))
                .take(1)
            else {
              val selDf = broadcast(
                selected.map(t => Tuple1(t._4)).toDF("sv"))
              rel.filter(!col("vec_id").isin(selected.map(_._2): _*))
                .crossJoin(selDf)
                .groupBy(col("vec_id"))
                .agg(first(col("rel")).as("rel"),
                  first(col("embedding")).as("embedding"),
                  max(lit(1.0) - vec_cosine_distance(col("embedding"), col("sv")))
                    .as("maxsim"))
                .select(col("vec_id"),
                  (lit(0.7) * col("rel") - lit(0.3) * col("maxsim")).as("score"),
                  col("embedding"))
                .orderBy(col("score").desc, col("vec_id")).limit(1)
                .take(1)
            }
          if (picked.isEmpty) exhausted = true
          else {
            val r = picked(0)
            selected :+= ((rk, r.getLong(0), r.getDouble(1),
              r.getSeq[Float](2).toArray))
          }
        }
        selected.map { case (rk, id, score, _) => (rk, id, score) }
          .toDF("rk", "vec_id", "score")
          .select(col("rk"), col("vec_id"), round(col("score"), 6).as("mmr6"))
      } finally rel.unpersist(blocking = true)
    }
  }

  /** Per-label centroid prototypes + the pairwise centroid cosine
    * distance matrix — the class-separability report run over an
    * embedding space before trusting its labels for filtering (and the
    * drift check between two snapshots' prototypes). Determinism: each
    * component is quantized to the 1e-6 integer grid BEFORE averaging
    * (the q202 centered-grid discipline), so the centroid is exact
    * integer algebra and the one float op per label pair is the
    * identical IEEE cosine fold both engines run. Scale shape: one
    * posexplode → (label, dim) integer means (|labels|·dims rows —
    * bounded by the label alphabet) → a |labels|²-row broadcast self
    * join; the cosine fold runs interpreted but only over that tiny
    * matrix, never the corpus. */
  val q241LabelCentroids: QueryDef = QueryDef(
    "q241_label_centroids",
    """WITH g AS (SELECT label,
      |    generate_subscripts(embedding, 1) AS dim,
      |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
      |      AS x6
      |  FROM embeddings),
      |q AS (SELECT label, dim, SUM(x6) // COUNT(*) AS cq
      |  FROM g GROUP BY label, dim),
      |c AS (SELECT label, list(cq ORDER BY dim) AS cv FROM q GROUP BY label)
      |SELECT a.label AS l1, b.label AS l2,
      |  round(1.0 - (list_reduce(list_transform(list_zip(a.cv, b.cv),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (u,v) -> u+v)
      |    / (sqrt(list_reduce(list_transform(a.cv,
      |         x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (u,v) -> u+v))
      |       * sqrt(list_reduce(list_transform(b.cv,
      |           x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (u,v) -> u+v)))),
      |    6) AS dist
      |FROM c a JOIN c b ON a.label < b.label""".stripMargin) { (s, d) =>
    val g = Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        expr("cast(round(cast(x as double) * 1000000) as bigint)").as("x6"))
    val q = g.groupBy(col("label"), col("dim"))
      .agg(expr("sum(x6) div count(1)").as("cq"))
    // both sides of the pair join read the centroid table — persist the
    // tiny |labels|-row frame so the corpus posexplode under it runs
    // once (swept by the harness after use)
    val c = q.groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("cq")))),
        p => p.getField("cq")).as("cv"))
      .persist()
    val cos = expr(
      """1.0 - (aggregate(zip_with(cv1, cv2,
        |    (p, q) -> cast(p as double) * cast(q as double)),
        |    cast(0 as double), (u, v) -> u + v)
        |  / (sqrt(aggregate(transform(cv1,
        |       x -> cast(x as double) * cast(x as double)),
        |       cast(0 as double), (u, v) -> u + v))
        |     * sqrt(aggregate(transform(cv2,
        |         x -> cast(x as double) * cast(x as double)),
        |         cast(0 as double), (u, v) -> u + v))))""".stripMargin)
    c.select(col("label").as("l1"), col("cv").as("cv1"))
      .join(broadcast(c.select(col("label").as("l2"), col("cv").as("cv2"))),
        col("l1") < col("l2"))
      .select(col("l1"), col("l2"), round(cos, 6).as("dist"))
  }

  /** Hard-negative mining for contrastive training — per query, the
    * top-10 MOST-similar vectors carrying a DIFFERENT label (the
    * metric-learning data-prep step: negatives near the decision
    * boundary are the ones worth training on). q51's broadcast-query
    * scan shape with the label predicate fused into the scan filter;
    * same bit-identical cosine fold, same oracle discipline. */
  val q244HardNegatives: QueryDef = QueryDef(
    "q244_hard_negatives",
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec, label AS qlab
       |  FROM embeddings WHERE vec_id < 5),
       |d AS (SELECT q.qid, e.vec_id,
       |    ${duckCosineDist("q.qvec", "e.embedding")} AS dist
       |  FROM embeddings e CROSS JOIN q WHERE e.label <> q.qlab),
       |r AS (SELECT qid, vec_id, dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
       |  FROM d)
       |SELECT qid, vec_id, rnk, round(dist, 6) AS dist
       |FROM r WHERE rnk <= 10""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlab"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("label") =!= col("qlab"))
      .withColumn("dist", vec_cosine_distance(col("qvec"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id"), col("rnk"),
        round(col("dist"), 6).as("dist"))
  }

  val all: Seq[QueryDef] = Seq(
    q50VecNorms, q51KnnBrute, q51bKnnPartial, q51cKnnFiltered, q52VecMetrics,
    q53AnnLsh, q54EmbedNearDup, q56AnnPq, q58AnnIvf, q187HybridRrf,
    q236MmrTopk, q241LabelCentroids, q244HardNegatives,
    // headline: the multi-stage ANN chain (broadcast coarse quantizer →
    // PQ ADC scan → bounded exact rerank) — the heaviest unmeasured
    // axis after round 7; promoted per the round-7 review
    q218IvfPqRerank.copy(headline = true))
}
