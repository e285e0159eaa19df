package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Distributed quality-classifier training — full-batch gradient
  * descent on a least-squares linear probe over surface text features.
  * The fastText/CCNet-style "train a cheap classifier over document
  * statistics, score the whole corpus" loop every LLM data pipeline
  * runs (GPT-3's quality filter, CCNet's LM filter). Beyond the
  * reference's surface (its function set is the closed tipb list,
  * `/root/reference/dbms/src/Flash/Coprocessor/DAGUtils.cpp:92-760` —
  * no training primitives), but a first-class 100 TB pipeline need.
  *
  * Scale shape (the q131/q202 iterative-trainer discipline): the
  * feature matrix is built in ONE corpus pass and cached — 5 small
  * integers per document. Each GD round broadcasts the 5 current
  * weights as literals, folds the per-row residual with a codegen'd
  * `aggregate(zip_with(...))` dot product, and partial-aggregates 5
  * per-feature gradient sums (map-side combined; exactly 5 rows cross
  * the exchange). The only driver materialization is the bounded
  * 5-value gradient collect per round — plan depth constant in the
  * iteration count, identical at 5 k or 5 B documents.
  *
  * Determinism bridge: features are exact integers (truncating `div`,
  * ≡ DuckDB `//` on BIGINT — both toward zero); residuals and scores
  * are exact BIGINT; gradient sums accumulate in DECIMAL(38,0)
  * (≡ DuckDB HUGEINT — overflow-free at any corpus size); the weight
  * update divides gradient by (N·4·10⁶) with BigInt truncating
  * division (≡ DuckDB HUGEINT `//`; NOT decimal `//`, which is true
  * division — the oracle casts accordingly). No floating point
  * anywhere: training is bit-reproducible across engines, partition
  * counts, and input orders.
  *
  * Step-size soundness: features are scaled into [0, 1000], so the
  * per-round contraction factor on a residual is ≈ Σᵢ E[xᵢ²] / 4·10⁶
  * ≲ 1.25 — monotone convergence territory for the least-squares
  * objective (verified by the loss-decrease contract in
  * `ClassifierSpec`).
  */
object Classifier {
  private val dims = 5
  private val targetScale = 1000000000L // y is lifted to 0 / 10^9
  private val lrDen = 4000000L          // w -= grad div (N * lrDen)

  /** doc_id, y (1 = English), x: 5 exact integer features in [0,1000]:
    * bias, scaled length, scaled word count, avg word length
    * (deci-chars), type/token ratio (per mille). */
  def features(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), col("n_chars"),
        split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"),
        (col("lang") === "en").cast("long").as("y"),
        expr("""array(
          1000L,
          least(n_chars, 2000L) div 2,
          least(size(w), 500) * 2L,
          least((n_chars * 10) div size(w), 1000L),
          cast(size(array_distinct(w)) as long) * 1000 div size(w))""")
          .as("x"))

  /** One GD round: collect the 5 per-feature gradient sums
    * Σ (w·x − 10⁹y)·xᵢ (exact, DECIMAL(38,0)), update weights with
    * BigInt truncating division. Bounded driver materialization —
    * 5 values per round. */
  private def step(feat: DataFrame, w: Array[Long], n: Long): Array[Long] = {
    val wlit = typedLit(w.toSeq) // one ArrayData literal: stable codegen source across GD rounds (r17)
    val resid = graft.functions.VectorFunctions.vec_dot_long(col("x"), wlit) -
      col("y") * lit(targetScale) // r17: codegen integer dot kernel
    val rows = feat
      .select(resid.as("r"), posexplode(col("x")).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg(sum((col("r") * col("xi")).cast("decimal(38,0)")).as("g"))
      .orderBy(col("i"))
      .collect()
    require(rows.length == dims, s"expected $dims gradient rows, got ${rows.length}")
    val den = BigInt(n) * lrDen
    rows.zipWithIndex.map { case (row, i) =>
      val g = BigInt(row.getDecimal(1).toBigInteger)
      w(i) - (g / den).toLong // BigInt / truncates toward zero ≡ DuckDB HUGEINT //
    }
  }

  /** `iters` full-batch GD rounds from w = 0. An empty corpus has a
    * zero gradient by definition — the weights stay at the origin. */
  def train(feat: DataFrame, iters: Int): Array[Long] = {
    val n = feat.count()
    if (n == 0) return Array.fill(dims)(0L)
    (0 until iters).foldLeft(Array.fill(dims)(0L))((w, _) => step(feat, w, n))
  }

  /** Exact integer loss Σ r² (grid units) — the convergence contract. */
  def loss(feat: DataFrame, w: Array[Long]): BigDecimal = {
    val wlit = typedLit(w.toSeq) // one ArrayData literal: stable codegen source across GD rounds (r17)
    val r = graft.functions.VectorFunctions.vec_dot_long(col("x"), wlit) -
      col("y") * lit(targetScale) // r17: codegen integer dot kernel
    BigDecimal(feat.select(sum((r * r).cast("decimal(38,0)")).as("l"))
      .head().getDecimal(0))
  }

  private def duckRound(k: Int, prev: String): String =
    s"""z$k AS (SELECT f.doc_id, SUM(w.w * f.x[w.i + 1]) AS z
       |        FROM f CROSS JOIN $prev w GROUP BY 1),
       |g$k AS (SELECT w.i,
       |          SUM(CAST((z.z - f.y * 1000000000) * f.x[w.i + 1]
       |              AS DECIMAL(38,0))) AS g
       |        FROM f JOIN z$k z USING (doc_id) CROSS JOIN $prev w
       |        GROUP BY 1),
       |w$k AS (SELECT w.i,
       |          w.w - CAST(CAST(g.g AS HUGEINT)
       |                     // (n.c * 4000000) AS BIGINT) AS w
       |        FROM $prev w JOIN g$k g USING (i) CROSS JOIN n)""".stripMargin

  /** Three GD rounds, then score every document with the learned
    * weights: exact integer score (10⁻⁹ grid of the [0,1] target) and
    * the thresholded prediction. The oracle replays the identical
    * training chain as CTEs (the q202 pattern). */
  val q211QualityClassifier: QueryDef = QueryDef(
    "q211_quality_classifier",
    """WITH t AS (SELECT doc_id, lang, n_chars,
      |    string_split_regex(trim(text), '\s+') AS w FROM documents),
      |f AS (SELECT doc_id,
      |    CAST(lang = 'en' AS BIGINT) AS y,
      |    [CAST(1000 AS BIGINT),
      |     least(n_chars, 2000) // 2,
      |     least(len(w), 500) * 2,
      |     least((n_chars * 10) // len(w), 1000),
      |     len(list_distinct(w)) * 1000 // len(w)] AS x
      |  FROM t),
      |n AS (SELECT COUNT(*) AS c FROM f),
      |w0 AS (SELECT i, CAST(0 AS BIGINT) AS w FROM range(5) t(i)),
      |""".stripMargin +
      Seq(1, 2, 3).map(k => duckRound(k, s"w${k - 1}")).mkString(",\n") +
      """
      |,zf AS (SELECT f.doc_id, f.y, SUM(w.w * f.x[w.i + 1]) AS z
      |        FROM f CROSS JOIN w3 w GROUP BY 1, 2)
      |SELECT doc_id, y, CAST(z AS BIGINT) AS score9,
      |  CAST(z > 500000000 AS BIGINT) AS pred
      |FROM zf""".stripMargin) { (s, d) =>
    // Persist-materialize-release: cache stays through the returned
    // DataFrame's final action (an eager unpersist made the timed
    // action re-derive the feature frame — the q202/q211 round-10
    // bench-breach class); harness sweeps via CacheHygiene.
    val feat = features(Tables.documents(s, d)).cache()
    val w = train(feat, iters = 3)
    val wlit = typedLit(w.toSeq) // one ArrayData literal: stable codegen source across GD rounds (r17)
    feat.select(col("doc_id"), col("y"),
      graft.functions.VectorFunctions.vec_dot_long(col("x"), wlit)
        .as("score9")) // r17: codegen integer dot kernel
      .select(col("doc_id"), col("y"), col("score9"),
        (col("score9") > lit(500000000L)).cast("long").as("pred"))
  }

  // headline: the iterative-trainer-with-bounded-collect shape
  // (repeated corpus passes over a cached feature frame + 5-value
  // driver rounds) — promoted per the round-7 review
  val all: Seq[QueryDef] = Seq(q211QualityClassifier.copy(headline = true))
}
