package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Statistical language-model scoring and corpus-statistics operators —
  * the quality-filtering stage of a pretraining pipeline (perplexity
  * gates à la CCNet/Gopher rules) built from the same distributed
  * primitives the reference's aggregation surface provides
  * (`/root/reference/dbms/src/Flash/Coprocessor/DAGExpressionAnalyzer.cpp`
  * aggregate pushdown; the LM itself is pure groupBy/join algebra).
  *
  * Determinism: every per-word log-probability is quantized to integer
  * micro-nats ON THE VOCABULARY TABLE (one `ln` per distinct word, not
  * per token), so per-document scores are exact BIGINT sums — immune to
  * float summation order across partitions and engines.
  */
object LangModel {

  // Width-repartitioned scan (guide §2.5 input-skew rule / the q201
  // discipline, extended r17): every LM operator's expensive stage is
  // per-row CPU (tokenize + bigram explode) that otherwise runs at the
  // SCAN's parallelism — one task when the documents table is a single
  // parquet file (measured r17: q197's whole tokenize/explode/score
  // lineage ran t=1 with 32 cores idle). Round-robin to cluster width
  // before any per-row work; row content is untouched. GATED on the
  // scan's estimated split count (r18, VERDICT ask #3): a many-split
  // corpus at scale already parallelizes and must not pay a full
  // corpus-text shuffle for nothing.
  private def docs(s: SparkSession, d: String) =
    Par.widen(Tables.documents(s, d))

  /** doc_id → exploded non-empty whitespace tokens. */
  private def words(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")

  /** Unigram LM train + score in one job: vocabulary counts (one
    * corpus-token groupBy — Heaps'-law bounded output), add-one
    * smoothed log-probs quantized to micro-nats per WORD, then each
    * document scores as an exact integer sum over its tokens.
    *
    * Scale shape: two corpus passes (vocab build, scoring join). The
    * scoring join is on the word key — Spark broadcasts the vocab side
    * when it fits (sf-scale) and falls back to a hash join keyed on a
    * Heaps'-bounded table (~10⁷ rows at 100 TB, still dwarfed by the
    * corpus) when it doesn't; either way the corpus shuffles at most
    * once. The (total, vocab-size) pair rides a 1-row broadcast.
    */
  val q170UnigramLm: QueryDef = QueryDef(
    "q170_unigram_lm",
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |                        x -> x <> '')) AS w
      |  FROM documents),
      |v AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
      |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tt, COUNT(*) AS vv FROM v),
      |lp AS (SELECT w, CAST(round(ln((c + 1.0) / (tt + vv)) * 1000000)
      |                      AS BIGINT) AS lp6 FROM v, t)
      |SELECT doc_id, COUNT(*) AS n_tokens, CAST(-SUM(lp6) AS BIGINT) AS nll6
      |FROM w JOIN lp USING (w) GROUP BY doc_id""".stripMargin) { (s, d) =>
    val w = words(s, d)
    val v = w.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val t = v.agg(sum(col("c")).cast("long").as("tt"), count(lit(1)).as("vv"))
    val lp = v.join(broadcast(t))
      .select(col("w"),
        round(log((col("c") + 1.0) / (col("tt") + col("vv"))) * 1000000)
          .cast("long").as("lp6"))
    w.join(lp, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), (-sum(col("lp6"))).cast("long").as("nll6"))
  }

  /** Encoding / mojibake QA: per-document counts of U+FFFD replacement
    * characters, C0/DEL control characters (tab+newline exempt), and
    * non-ASCII code points, plus a printable-ASCII ratio in exact ppm.
    * The corpus is clean ASCII by construction, so deterministic noise
    * is injected per doc_id class to make every counter provably
    * nonzero — in production the column is the raw crawl bytes. Pure
    * per-row map, no shuffle; all-integer output. */
  val q171EncodingQa: QueryDef = QueryDef(
    "q171_encoding_qa",
    """WITH noisy AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % 7 AS INT)
       |      WHEN 0 THEN text || ' ' || chr(65533) || chr(65533)
       |      WHEN 1 THEN text || chr(9) || 'caf' || chr(233) || ' r'
       |                  || chr(233) || 'sum' || chr(233)
       |      WHEN 2 THEN chr(1) || text || chr(127)
       |      ELSE text END AS s
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(length(s) AS BIGINT) AS n_chars,
       |  CAST(len(regexp_extract_all(s, chr(65533))) AS BIGINT) AS n_repl,
       |  CAST(len(regexp_extract_all(s, '[\x00-\x08\x0B-\x1F\x7F]'))
       |       AS BIGINT) AS n_ctrl,
       |  CAST(len(regexp_extract_all(s, '[^\x00-\x7F]')) AS BIGINT)
       |       AS n_nonascii,
       |  CAST(len(regexp_extract_all(s, '[ -~]')) * 1000000 // length(s)
       |       AS BIGINT) AS printable_ppm
       |FROM noisy""".stripMargin) { (s, d) =>
    val repl = "�"
    val noisy = docs(s, d).select(col("doc_id"),
      when(col("doc_id") % 7 === 0, concat(col("text"), lit(" " + repl + repl)))
        .when(col("doc_id") % 7 === 1,
          concat(col("text"), lit("\tcafé résumé")))
        .when(col("doc_id") % 7 === 2,
          concat(lit("\u0001"), col("text"), lit("\u007f")))
        .otherwise(col("text")).as("s"))
    noisy.select(col("doc_id"),
      length(col("s")).cast("long").as("n_chars"),
      regexp_count(col("s"), lit(repl)).cast("long").as("n_repl"),
      regexp_count(col("s"), lit("[\\x00-\\x08\\x0B-\\x1F\\x7F]"))
        .cast("long").as("n_ctrl"),
      regexp_count(col("s"), lit("[^\\x00-\\x7F]")).cast("long").as("n_nonascii"),
      expr("regexp_count(s, '[ -~]') * 1000000L div length(s)")
        .cast("long").as("printable_ppm"))
  }

  /** Zipf rank-frequency audit: ln-ln regression of count against rank
    * over the top-200 vocabulary — the standard sanity check that a
    * corpus's token distribution is natural (slope ≈ -1) rather than
    * templated/spammy. Scale shape: one corpus-token groupBy, then
    * TakeOrderedAndProject caps the vocab to 200 rows BEFORE the
    * single-partition rank window — the window only ever sees a
    * constant-size input, regardless of corpus size. */
  val q172ZipfSlope: QueryDef = QueryDef(
    "q172_zipf_slope",
    """WITH w AS (
      |  SELECT unnest(list_filter(string_split(text, ' '),
      |                x -> x <> '')) AS w FROM documents),
      |v AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
      |top AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS r
      |        FROM v ORDER BY c DESC, w LIMIT 200)
      |SELECT COUNT(*) AS n_words,
      |  round(regr_slope(ln(c), ln(r)), 6) AS slope,
      |  round(regr_intercept(ln(c), ln(r)), 6) AS icept
      |FROM top""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val v = words(s, d).groupBy(col("w")).agg(count(lit(1)).as("c"))
    val top = v.orderBy(col("c").desc, col("w")).limit(200)
      // bounded input (≤200 rows): the empty-partitionBy window is safe
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("w"))))
    top.agg(count(lit(1)).as("n_words"),
      round(regr_slope(log(col("c")), log(col("r"))), 6).as("slope"),
      round(regr_intercept(log(col("c")), log(col("r"))), 6).as("icept"))
  }

  /** Bigram LM train + score: conditional P(w2|w1) with add-one
    * smoothing over the observed bigram table — the step up from q170
    * that penalizes improbable word ORDER, not just rare words (the
    * form CCNet-style perplexity gates actually use). Same determinism
    * discipline: one `ln` per distinct bigram, quantized to micro-nats,
    * per-doc scores as exact BIGINT sums.
    *
    * Scale shape: bigram pairs are derived per row (zip of the token
    * array with its own tail — no positional self-join), so the corpus
    * explodes once; the bigram vocabulary is Heaps-bounded (≪ corpus
    * pairs), the context-count table derives from it with one more
    * tiny groupBy, and scoring is a single (w1,w2)-keyed join that
    * shuffles the corpus pairs at most once. */
  val q174BigramLm: QueryDef = QueryDef(
    "q174_bigram_lm",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |                 x -> x <> '') AS ws FROM documents),
      |pairs AS (
      |  SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
      |         unnest(ws[2:len(ws)]) AS w2
      |  FROM tok WHERE len(ws) >= 2),
      |cb AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY w1, w2),
      |cw AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw FROM cb GROUP BY w1),
      |vv AS (SELECT COUNT(DISTINCT w1) + 1 AS v FROM cw),
      |lp AS (SELECT w1, w2,
      |         CAST(round(ln((c + 1.0) / (cw + v)) * 1000000) AS BIGINT) AS lp6
      |       FROM cb JOIN cw USING (w1), vv)
      |SELECT doc_id, COUNT(*) AS n_bigrams, CAST(-SUM(lp6) AS BIGINT) AS nll6
      |FROM pairs JOIN lp USING (w1, w2) GROUP BY doc_id""".stripMargin) { (s, d) =>
    val tok = docs(s, d).select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = tok.select(col("doc_id"),
        explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p")) // r17: codegen pair stream (zip_with lambdas run interpreted)
      .select(col("doc_id"), col("p").getField("0").as("w1"), col("p").getField("1").as("w2"))
    val cb = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val cw = cb.groupBy(col("w1")).agg(sum(col("c")).cast("long").as("cw"))
    val vv = cw.agg((count(lit(1)) + 1).as("v"))
    val lp = cb.join(cw, "w1").join(broadcast(vv))
      .select(col("w1"), col("w2"),
        round(log((col("c") + 1.0) / (col("cw") + col("v"))) * 1000000)
          .cast("long").as("lp6"))
    pairs.join(lp, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("lp6"))).cast("long").as("nll6"))
  }

  /** TextRank keyword extraction: weighted PageRank over the
    * co-occurrence graph of the corpus's top-50 words (nodes bounded,
    * edges = symmetrized adjacent-bigram counts), two damped
    * iterations, top-10 keywords out. A standard unsupervised
    * keyword/keyphrase primitive for corpus labeling.
    *
    * Determinism: ranks are integer micro-units and every update term
    * is an individually floor-divided BIGINT — `(850·wt·pr) div
    * (1000·deg)` — so iteration sums are exact integers in any
    * partition order and engine (all values positive → Spark `div` and
    * DuckDB `//` agree).
    *
    * Scale shape: the node set is CAPPED (top-50 via
    * TakeOrderedAndProject), so the edge/degree/rank tables are all
    * bounded and broadcastable; the corpus contributes one bigram scan
    * whose pair stream is filtered by two broadcast semi-joins before
    * the bounded-key edge groupBy (map-side combine collapses it). The
    * iterations touch only bounded tables — corpus cost is independent
    * of iteration count. */
  val q175TextRank: QueryDef = QueryDef(
    "q175_textrank",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |                 x -> x <> '') AS ws FROM documents),
      |pairs AS (
      |  SELECT unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
      |  FROM tok WHERE len(ws) >= 2),
      |v AS (SELECT w1 AS w, COUNT(*) AS c FROM pairs GROUP BY w1),
      |top AS (SELECT w, c FROM v ORDER BY c DESC, w LIMIT 50),
      |und AS (
      |  SELECT LEAST(w1, w2) AS a, GREATEST(w1, w2) AS b, COUNT(*) AS wt
      |  FROM pairs
      |  WHERE w1 <> w2 AND w1 IN (SELECT w FROM top)
      |    AND w2 IN (SELECT w FROM top)
      |  GROUP BY 1, 2),
      |edges AS (
      |  SELECT a AS src, b AS dst, wt FROM und
      |  UNION ALL SELECT b AS src, a AS dst, wt FROM und),
      |deg AS (SELECT src, CAST(SUM(wt) AS BIGINT) AS s FROM edges GROUP BY src),
      |pr0 AS (SELECT w, CAST(1000000 AS BIGINT) AS pr FROM top),
      |pr1 AS (
      |  SELECT e.dst AS w,
      |    150000 + CAST(SUM((850 * e.wt * p.pr) // (1000 * d.s)) AS BIGINT) AS pr
      |  FROM edges e JOIN deg d ON e.src = d.src JOIN pr0 p ON p.w = e.src
      |  GROUP BY e.dst),
      |pr2 AS (
      |  SELECT e.dst AS w,
      |    150000 + CAST(SUM((850 * e.wt * p.pr) // (1000 * d.s)) AS BIGINT) AS pr
      |  FROM edges e JOIN deg d ON e.src = d.src JOIN pr1 p ON p.w = e.src
      |  GROUP BY e.dst)
      |SELECT w, pr FROM pr2 ORDER BY pr DESC, w LIMIT 10""".stripMargin) { (s, d) =>
    val tok = docs(s, d).select(
        filter(split(col("text"), " "), w => w =!= "").as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = tok.select(
        explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p")) // r17: codegen pair stream (zip_with lambdas run interpreted)
      .select(col("p").getField("0").as("w1"), col("p").getField("1").as("w2"))
    val topW = pairs.groupBy(col("w1").as("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(50)
    val und = pairs.filter(col("w1") =!= col("w2"))
      .join(broadcast(topW.select(col("w").as("w1"))), Seq("w1"), "left_semi")
      .join(broadcast(topW.select(col("w").as("w2"))), Seq("w2"), "left_semi")
      .groupBy(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .agg(count(lit(1)).as("wt"))
    val edges = und.select(col("a").as("src"), col("b").as("dst"), col("wt"))
      .union(und.select(col("b").as("src"), col("a").as("dst"), col("wt")))
    val deg = edges.groupBy(col("src")).agg(sum(col("wt")).cast("long").as("s"))
    val pr0 = topW.select(col("w"), lit(1000000L).as("pr"))
    def step(pr: DataFrame): DataFrame =
      edges.join(deg, "src")
        .join(pr.withColumnRenamed("w", "src"), "src")
        .groupBy(col("dst").as("w"))
        .agg((lit(150000L) +
          sum(expr("(850 * wt * pr) div (1000 * s)"))).cast("long").as("pr"))
    step(step(pr0)).orderBy(col("pr").desc, col("w")).limit(10)
  }

  /** Multinomial Naive Bayes text classifier — train on the corpus's
    * source labels, predict every document's class (the fastText/CCNet
    * quality-classifier analog, as pure groupBy/join algebra).
    *
    * Unseen-word handling WITHOUT a corpus×classes expansion: for class
    * c, score(d,c) = prior(c) + Σ_{w∈d, w∈vocab(c)} lp(c,w)
    *               + (|d| − |d ∩ vocab(c)|)·floor(c),
    * so the token stream only inner-joins the (class,word) likelihood
    * table (a token reaches the ≤C classes containing it) and the
    * missing-word mass rides the per-class floor — the per-doc×class
    * grid is DOC-level (C rows per doc, C bounded), never token-level.
    *
    * Determinism: priors, likelihoods, and floors are quantized to
    * integer micro-nats per DISTINCT (class,word); scores are exact
    * BIGINT sums; argmax tie-breaks on class name. */
  val q176NaiveBayes: QueryDef = QueryDef(
    "q176_naive_bayes",
    """WITH w AS (
      |  SELECT doc_id, source, unnest(list_filter(string_split(text, ' '),
      |                                x -> x <> '')) AS w
      |  FROM documents),
      |dt AS (SELECT doc_id, COUNT(*) AS n_tok FROM w GROUP BY doc_id),
      |wc AS (SELECT source AS cls, w, COUNT(*) AS c FROM w GROUP BY cls, w),
      |cw AS (SELECT cls, CAST(SUM(c) AS BIGINT) AS cw FROM wc GROUP BY cls),
      |vv AS (SELECT COUNT(DISTINCT w) AS v FROM wc),
      |prior AS (
      |  SELECT source AS cls, CAST(round(ln(COUNT(*) * 1.0 /
      |      (SELECT COUNT(*) FROM documents)) * 1000000) AS BIGINT) AS prior6
      |  FROM documents GROUP BY cls),
      |cstat AS (
      |  SELECT p.cls, p.prior6,
      |    CAST(round(ln(1.0 / (cw.cw + vv.v)) * 1000000) AS BIGINT) AS floor6
      |  FROM prior p JOIN cw ON p.cls = cw.cls, vv),
      |lp AS (
      |  SELECT wc.cls, wc.w,
      |    CAST(round(ln((wc.c + 1.0) / (cw.cw + vv.v)) * 1000000) AS BIGINT) AS lp6
      |  FROM wc JOIN cw ON wc.cls = cw.cls, vv),
      |present AS (
      |  SELECT t.doc_id, lp.cls, CAST(SUM(lp.lp6) AS BIGINT) AS sl,
      |         COUNT(*) AS cp
      |  FROM w t JOIN lp ON t.w = lp.w GROUP BY t.doc_id, lp.cls),
      |scored AS (
      |  SELECT dt.doc_id, cs.cls,
      |    cs.prior6 + COALESCE(p.sl, 0)
      |      + (dt.n_tok - COALESCE(p.cp, 0)) * cs.floor6 AS score6
      |  FROM dt CROSS JOIN cstat cs
      |  LEFT JOIN present p ON p.doc_id = dt.doc_id AND p.cls = cs.cls),
      |ranked AS (
      |  SELECT doc_id, cls, score6,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY score6 DESC, cls) AS rn
      |  FROM scored)
      |SELECT r.doc_id, r.cls AS pred, CAST(r.score6 AS BIGINT) AS score6,
      |  CAST(CASE WHEN r.cls = d.source THEN 1 ELSE 0 END AS BIGINT) AS correct
      |FROM ranked r JOIN documents d USING (doc_id) WHERE rn = 1""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val doc = docs(s, d)
      val w = doc.select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val dt = w.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
      val wc = w.groupBy(col("source").as("cls"), col("w"))
        .agg(count(lit(1)).as("c"))
      val cw = wc.groupBy(col("cls")).agg(sum(col("c")).cast("long").as("cw"))
      val vv = wc.agg(countDistinct(col("w")).as("v"))
      val tot = doc.agg(count(lit(1)).as("t"))
      val prior = doc.groupBy(col("source").as("cls"))
        .agg(count(lit(1)).as("nc")).join(broadcast(tot))
        .select(col("cls"),
          round(log(col("nc") * 1.0 / col("t")) * 1000000)
            .cast("long").as("prior6"))
      val cstat = prior.join(cw, "cls").join(broadcast(vv))
        .select(col("cls"), col("prior6"),
          round(log(lit(1.0) / (col("cw") + col("v"))) * 1000000)
            .cast("long").as("floor6"))
      val lp = wc.join(cw, "cls").join(broadcast(vv))
        .select(col("cls"), col("w"),
          round(log((col("c") + 1.0) / (col("cw") + col("v"))) * 1000000)
            .cast("long").as("lp6"))
      // tf-compress before the model join: scoring joins the |classes|
      // model rows per WORD, so feeding raw token occurrences multiplies
      // the shuffle by the within-doc repetition factor for nothing —
      // Σ_tokens lp6 = Σ_(distinct w) tf·lp6 exactly (integer algebra),
      // and the matched-token count is Σ tf. Cuts the 100× reading from
      // 602 s to the family's linear band.
      val tf = w.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val present = tf.join(lp, "w")
        .groupBy(col("doc_id"), col("cls"))
        .agg(sum(col("lp6") * col("tf")).cast("long").as("sl"),
          sum(col("tf")).cast("long").as("cp"))
      val scored = dt.crossJoin(broadcast(cstat))
        .join(present, Seq("doc_id", "cls"), "left")
        .select(col("doc_id"), col("cls"),
          (col("prior6") + coalesce(col("sl"), lit(0L)) +
            (col("n_tok") - coalesce(col("cp"), lit(0L))) * col("floor6"))
            .as("score6"))
      scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score6").desc, col("cls"))))
        .filter(col("rn") === 1)
        .join(doc.select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("cls").as("pred"),
          col("score6").cast("long").as("score6"),
          when(col("cls") === col("source"), 1L).otherwise(0L).as("correct"))
  }

  /** Per-document TF-IDF keywords (top-3 terms per doc) — the
    * per-document counterpart of q175's corpus-level TextRank and the
    * weighting behind q75b's BM25 retrieval, as its own verifiable op.
    *
    * All-integer scoring: idf is quantized to micro-nats per DISTINCT
    * word, the score is the exact BIGINT product tf·idf6, and the
    * per-doc rank window tie-breaks on the word — bit-deterministic at
    * any partitioning. Scale shape: one (doc,word) groupBy, one
    * word-keyed df groupBy feeding a vocab-sized join, and a
    * doc-partitioned rank that Spark executes as WindowGroupLimit
    * (map-side top-k before the shuffle). */
  val q177TfIdf: QueryDef = QueryDef(
    "q177_tfidf_keywords",
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |                        x -> x <> '')) AS w
      |  FROM documents),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w GROUP BY doc_id, w),
      |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY w),
      |nn AS (SELECT COUNT(*) AS n FROM documents),
      |idf AS (SELECT w, CAST(round(ln((n + 1.0) / (df + 1.0)) * 1000000)
      |                       AS BIGINT) AS idf6
      |        FROM df, nn),
      |scored AS (
      |  SELECT tf.doc_id, tf.w, CAST(tf.tf * idf.idf6 AS BIGINT) AS score6,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |                       ORDER BY tf.tf * idf.idf6 DESC, tf.w) AS rnk
      |  FROM tf JOIN idf USING (w))
      |SELECT doc_id, w, score6, CAST(rnk AS BIGINT) AS rnk
      |FROM scored WHERE rnk <= 3""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val doc = docs(s, d)
    val w = words(s, d)
    val tf = w.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val df = w.groupBy(col("w")).agg(countDistinct(col("doc_id")).as("df"))
    val nn = doc.agg(count(lit(1)).as("n"))
    val idf = df.join(broadcast(nn))
      .select(col("w"),
        round(log((col("n") + 1.0) / (col("df") + 1.0)) * 1000000)
          .cast("long").as("idf6"))
    tf.join(idf, "w")
      .withColumn("score6", (col("tf") * col("idf6")).cast("long"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score6").desc, col("w"))))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("w"), col("score6"),
        col("rnk").cast("long").as("rnk"))
  }

  /** PMI collocation mining: pointwise mutual information
    * ln(N·c(a,b) / (c(a)·c(b))) for every adjacent word pair seen ≥ 5
    * times — the classic collocation/multi-word-expression detector
    * (Church & Hanks 1990) used to build tokenizer merge seeds and
    * phrase lists. PMI is quantized to micro-nats on the PAIR table
    * (one `ln` per distinct surviving pair).
    *
    * Scale shape: one corpus bigram explode feeds a pair groupBy whose
    * output is Heaps-bounded; unigram counts derive from the SAME pair
    * table (sum over w1) plus a last-token-per-doc correction, so the
    * corpus is scanned once for pairs and once for exact unigram
    * counts — both map-side-combined aggregates. The c(a)/c(b) lookups
    * join the bounded vocab table twice (broadcast at any realistic
    * vocab size); nothing corpus-sized is shuffled more than once.
    */
  val q196PmiCollocations: QueryDef = QueryDef(
    "q196_pmi_collocations",
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |                        x -> x <> '')) AS w
      |  FROM documents),
      |uni AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
      |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
      |tok AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |                 x -> x <> '') AS ws FROM documents),
      |pairs AS (
      |  SELECT unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
      |  FROM tok WHERE len(ws) >= 2),
      |cb AS (SELECT w1, w2, COUNT(*) AS c FROM pairs
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 5)
      |SELECT w1, w2, CAST(cb.c AS BIGINT) AS n_pair,
      |  CAST(round(ln(cb.c * 1.0 * n.n / (u1.c * 1.0 * u2.c)) * 1000000)
      |       AS BIGINT) AS pmi6
      |FROM cb JOIN uni u1 ON cb.w1 = u1.w
      |        JOIN uni u2 ON cb.w2 = u2.w, n""".stripMargin) { (s, d) =>
    val w = words(s, d)
    val uni = w.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).cast("long").as("n"))
    val tok = docs(s, d).select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= "").as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = tok.select(
        explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p")) // r17: codegen pair stream (zip_with lambdas run interpreted)
      .select(col("p").getField("0").as("w1"), col("p").getField("1").as("w2"))
    val cb = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 5)
    cb.join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .join(broadcast(n))
      .select(col("w1"), col("w2"), col("c").as("n_pair"),
        round(log(col("c") * lit(1.0) * col("n") /
          (col("c1") * lit(1.0) * col("c2"))) * 1000000)
          .cast("long").as("pmi6"))
  }

  /** Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    * Goodman 1998 formulation, fixed discount D = 0.75):
    *
    *   P(w2|w1) = (c(w1,w2) − D)/c(w1)
    *            + D·N1+(w1,•)/c(w1) · N1+(•,w2)/N1+(•,•)
    *
    * — the smoothing real perplexity gates use (KenLM's default),
    * distinguishing words that appear in MANY contexts from words that
    * are merely frequent. Since we score the training corpus itself,
    * every scored bigram has c ≥ 1 > D, so the discounted term stays
    * positive and no backoff-only path is needed.
    *
    * Determinism: one `ln` per distinct bigram, quantized to
    * micro-nats on the pair table; doc scores are exact BIGINT sums.
    *
    * Scale shape: identical to q174 — one corpus bigram explode, all
    * model tables (pair counts, left/right continuation counts) are
    * Heaps-bounded derivatives of it, and scoring is a single
    * (w1,w2)-keyed join; continuation totals ride a 1-row broadcast.
    *
    * The q176 tf-compression rewrite (Σ lp6 over raw bigrams ≡
    * Σ tf·lp6 over per-(doc, bigram) counts) was evaluated in r12 and
    * REJECTED on measurement: distinct-(doc, bigram)/raw-bigram ratio
    * is 0.965 on this corpus shape (bigrams barely repeat within a
    * document, unlike q176's unigrams), so pre-compressing adds a
    * (doc, w1, w2) exchange to save 3.5% of the scoring-join shuffle —
    * a wash at sf0.1 (medians 3.52 s vs 3.55 s, 3-run fresh-JVM
    * subset harness). See docs/BENCH_NOTES.md "r12 q197 run-down".
    */
  val q197KneserNey: QueryDef = QueryDef(
    "q197_kneser_ney",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |                 x -> x <> '') AS ws FROM documents),
      |pairs AS (
      |  SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
      |         unnest(ws[2:len(ws)]) AS w2
      |  FROM tok WHERE len(ws) >= 2),
      |cb AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY w1, w2),
      |cw AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw,
      |              COUNT(*) AS n1f FROM cb GROUP BY w1),
      |cont AS (SELECT w2, COUNT(*) AS n1b FROM cb GROUP BY w2),
      |tot AS (SELECT COUNT(*) AS t FROM cb),
      |lp AS (SELECT w1, w2,
      |    CAST(round(ln((c - 0.75) / cw
      |        + 0.75 * n1f / cw * n1b / t) * 1000000) AS BIGINT) AS lp6
      |  FROM cb JOIN cw USING (w1) JOIN cont USING (w2), tot)
      |SELECT doc_id, COUNT(*) AS n_bigrams, CAST(-SUM(lp6) AS BIGINT) AS nll6
      |FROM pairs JOIN lp USING (w1, w2) GROUP BY doc_id""".stripMargin) { (s, d) =>
    val tok = docs(s, d).select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= "").as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = tok.select(col("doc_id"),
        explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p")) // r17: codegen pair stream (zip_with lambdas run interpreted)
      .select(col("doc_id"), col("p").getField("0").as("w1"), col("p").getField("1").as("w2"))
    val cb = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val cw = cb.groupBy(col("w1"))
      .agg(sum(col("c")).cast("long").as("cw"), count(lit(1)).as("n1f"))
    val cont = cb.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val tot = cb.agg(count(lit(1)).as("t"))
    val lp = cb.join(cw, "w1").join(cont, "w2").join(broadcast(tot))
      .select(col("w1"), col("w2"),
        round(log((col("c") - 0.75) / col("cw")
          + lit(0.75) * col("n1f") / col("cw") * col("n1b") / col("t"))
          * 1000000).cast("long").as("lp6"))
    pairs.join(lp, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("lp6"))).cast("long").as("nll6"))
  }

  /** CCNet perplexity-bucket assignment (Wenzek et al. 2020,
    * arXiv:1911.00359 §4.3): per LANGUAGE, split the corpus into
    * head/middle/tail terciles by LM perplexity — the partition CCNet
    * publishes and pretraining recipes sample from. Perplexity is the
    * q197 Kneser-Ney doc score normalized per bigram (integer
    * micro-nats — exact division).
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY lang)`
    * would funnel each language (corpus-scale at 100 TB — CCNet's
    * largest shard IS English) into one task. Instead ONE global
    * `ScalableSort` rank over (lang, ppl, doc_id) + a |langs|-row
    * (min-rank, count) broadcast converts global ranks to per-language
    * tercile positions with bounded per-task work.
    */
  val q203CcnetBuckets: QueryDef = QueryDef(
    "q203_ccnet_buckets",
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '),
       |                 x -> x <> '') AS ws FROM documents),
       |pairs AS (
       |  SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
       |         unnest(ws[2:len(ws)]) AS w2
       |  FROM tok WHERE len(ws) >= 2),
       |cb AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY w1, w2),
       |cw AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw,
       |              COUNT(*) AS n1f FROM cb GROUP BY w1),
       |cont AS (SELECT w2, COUNT(*) AS n1b FROM cb GROUP BY w2),
       |tot AS (SELECT COUNT(*) AS t FROM cb),
       |lp AS (SELECT w1, w2,
       |    CAST(round(ln((c - 0.75) / cw
       |        + 0.75 * n1f / cw * n1b / t) * 1000000) AS BIGINT) AS lp6
       |  FROM cb JOIN cw USING (w1) JOIN cont USING (w2), tot),
       |scores AS (SELECT doc_id, COUNT(*) AS nb, -SUM(lp6) AS nll6
       |  FROM pairs JOIN lp USING (w1, w2) GROUP BY doc_id),
       |ppl AS (SELECT s.doc_id, d.lang, s.nll6 // s.nb AS ppl6
       |  FROM scores s JOIN documents d USING (doc_id)),
       |r AS (SELECT doc_id, lang, ppl6,
       |    row_number() OVER (PARTITION BY lang ORDER BY ppl6, doc_id) AS lr,
       |    COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM ppl)
       |SELECT doc_id, lang, CAST(ppl6 AS BIGINT) AS ppl6,
       |  CASE CAST((lr - 1) * 3 // n AS INT) WHEN 0 THEN 'head'
       |    WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM r""".stripMargin) { (s, d) =>
    val scores = q197KneserNey.fn(s, d)
    val ppl = scores
      .join(docs(s, d).select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"),
        expr("nll6 div n_bigrams").as("ppl6"))
    val ranked = graft.operators.ScalableSort.globalRowNumber(
      ppl, "rn", col("lang"), col("ppl6"), col("doc_id"))
    val offsets = ranked.groupBy(col("lang"))
      .agg(min(col("rn")).as("lo"), count(lit(1)).as("n"))
    ranked.join(broadcast(offsets), "lang")
      .select(col("doc_id"), col("lang"), col("ppl6"),
        expr("""CASE cast((rn - lo) * 3 div n AS INT) WHEN 0 THEN 'head'
                |  WHEN 1 THEN 'middle' ELSE 'tail' END""".stripMargin)
          .as("bucket"))
  }

  /** Classifier evaluation: exact ROC AUC by rank-sum (Mann-Whitney
    * U) — AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) — the evaluation
    * layer every scored-filtering pipeline needs before trusting a
    * quality gate. Scored here: the English-stopword-ratio signal
    * against the corpus `lang` labels, which in THIS testdata are
    * assigned independently of the text — so the honest expected
    * outcome is the null calibration AUC ≈ 0.5, and the contract test
    * pins both that and (on a constructed informative fixture) that
    * the same harness reports AUC → 1 when signal exists.
    *
    * Exactness: ranks come from the scale-safe global row_number with
    * a doc_id tie-break (deterministic in both engines; the
    * statistical mid-rank tie correction is deliberately traded for
    * bit-reproducibility and documented); AUC is an exact integer ppm
    * division. ONE corpus-sized rank, then a 1-row rollup.
    */
  def aucFrom(labeled: DataFrame): DataFrame = {
    val ranked = graft.operators.ScalableSort.globalRowNumber(
      labeled, "rnk", col("score"), col("doc_id"))
    ranked.agg(
      sum(col("pos")).cast("long").as("n_pos"),
      (count(lit(1)) - sum(col("pos"))).cast("long").as("n_neg"),
      expr("""(sum(CASE WHEN pos = 1 THEN rnk ELSE 0 END)
             |   - sum(pos) * (sum(pos) + 1) div 2) * 1000000L
             | div (sum(pos) * (count(1) - sum(pos)))""".stripMargin)
        .as("auc_ppm"))
  }

  val q209AucEval: QueryDef = QueryDef(
    "q209_auc_eval",
    """WITH t AS (SELECT doc_id, lang,
      |    string_split_regex(trim(text), '\s+') AS w FROM documents),
      |s AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
      |    len(list_filter(w, x -> list_contains(['the','a','of','and','to'], x)))
      |      * 1000000 // len(w) AS score
      |  FROM t),
      |r AS (SELECT pos, row_number() OVER (ORDER BY score, doc_id) AS rnk FROM s)
      |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
      |  CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg,
      |  CAST((SUM(CASE WHEN pos = 1 THEN rnk ELSE 0 END)
      |        - SUM(pos) * (SUM(pos) + 1) // 2) * 1000000
      |       // (SUM(pos) * (COUNT(*) - SUM(pos))) AS BIGINT) AS auc_ppm
      |FROM r""".stripMargin) { (s, d) =>
    val labeled = docs(s, d).select(col("doc_id"),
      when(col("lang") === "en", 1).otherwise(0).as("pos"),
      expr("""size(filter(split(trim(text), '\\s+'),
             |  x -> x IN ('the','a','of','and','to'))) * 1000000L
             | div size(split(trim(text), '\\s+'))""".stripMargin).as("score"))
    aucFrom(labeled)
  }

  /** Tie-corrected ROC AUC (the standard Mann-Whitney mid-rank form):
    * tied scores share the mean of the ranks they occupy, so a
    * classifier that outputs a constant scores exactly 0.5 instead of
    * an order-dependent value. Exactness via integer HALF-ranks —
    * every mid-rank is (2·lo + g − 1)/2 for a tie-group starting at
    * global rank `lo` with `g` members, so 2·midrank is always
    * integral: AUC = (Σ 2·midrank⁺ − n⁺(n⁺+1)) / (2 n⁺ n⁻), computed
    * in DECIMAL(38,0) (Σ 2·midrank⁺ ~ n², past BIGINT at corpus
    * scale) with one exact integer ppm division at the end.
    *
    * Scale shape: ONE scale-safe global rank (q209's), then a
    * score-keyed aggregate (map-side combined; |distinct scores| ≤ n)
    * and a 1-row rollup. No join — the tie-group sums Σp·(2lo+g−1)
    * fold directly. Complements q209, which deliberately keeps the
    * uncorrected deterministic-tie-break form; on the tie-heavy
    * stopword signal the two legitimately differ. */
  def aucTieCorrectedFrom(labeled: DataFrame): DataFrame = {
    val ranked = graft.operators.ScalableSort.globalRowNumber(
      labeled, "rnk", col("score"), col("doc_id"))
    val grp = ranked.groupBy(col("score"))
      .agg(min(col("rnk")).as("lo"), count(lit(1)).as("g"),
        sum(col("pos")).as("p"))
    grp.agg(
      sum(col("p")).cast("long").as("n_pos"),
      (sum(col("g")) - sum(col("p"))).cast("long").as("n_neg"),
      expr("""cast((sum(cast(p as decimal(38,0)) * (2 * lo + g - 1))
             |   - cast(sum(p) as decimal(38,0)) * (sum(p) + 1)) * 1000000
             | div (2 * cast(sum(p) as decimal(38,0)) * (sum(g) - sum(p)))
             | as bigint)""".stripMargin).as("auc_ppm"))
  }

  val q209bAucTieCorrected: QueryDef = QueryDef(
    "q209b_auc_tie_corrected",
    """WITH t AS (SELECT doc_id, lang,
      |    string_split_regex(trim(text), '\s+') AS w FROM documents),
      |s AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
      |    len(list_filter(w, x -> list_contains(['the','a','of','and','to'], x)))
      |      * 1000000 // len(w) AS score
      |  FROM t),
      |r AS (SELECT pos, score, row_number() OVER (ORDER BY score, doc_id) AS rnk FROM s),
      |g AS (SELECT score, MIN(rnk) AS lo, COUNT(*) AS g, SUM(pos) AS p
      |  FROM r GROUP BY score)
      |SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
      |  CAST(SUM(g) - SUM(p) AS BIGINT) AS n_neg,
      |  CAST((SUM(p * (2 * lo + g - 1)) - SUM(p) * (SUM(p) + 1)) * 1000000
      |       // (2 * SUM(p) * (SUM(g) - SUM(p))) AS BIGINT) AS auc_ppm
      |FROM g""".stripMargin) { (s, d) =>
    val labeled = docs(s, d).select(col("doc_id"),
      when(col("lang") === "en", 1).otherwise(0).as("pos"),
      expr("""size(filter(split(trim(text), '\\s+'),
             |  x -> x IN ('the','a','of','and','to'))) * 1000000L
             | div size(split(trim(text), '\\s+'))""".stripMargin).as("score"))
    aucTieCorrectedFrom(labeled)
  }

  /** Jelinek-Mercer interpolated trigram LM — the third member of the
    * n-gram smoothing family (add-one bigram q174, Kneser-Ney q197):
    * P(w3|w1w2) = 0.6·c(w123)/c(w12·) + 0.3·c(w23)/c(w2·) + 0.1·c(w3)/T,
    * the fixed-λ interpolation of Jelinek & Mercer 1980 (the smoothing
    * CCNet-style perplexity filters fall back to when KN's discount is
    * undefined at low counts). Every interpolated probability is an
    * exact rational of corpus counts; the ONLY float op per distinct
    * trigram is the identical IEEE sequence
    * ln(0.6·a/b + 0.3·c/d + 0.1·e/f), quantized to micro-nats, so doc
    * scores are exact BIGINT sums (the q197 determinism rule).
    *
    * Scale shape: one corpus trigram explode + one pair explode + one
    * token explode, each Heaps-bounded after its groupBy; scoring is a
    * single (w1,w2,w3) join; the token total rides a 1-row broadcast.
    */
  val q213TrigramJmLm: QueryDef = QueryDef(
    "q213_trigram_jm_lm",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |                 x -> x <> '') AS ws FROM documents),
      |tri AS (
      |  SELECT doc_id, unnest(ws[1:len(ws)-2]) AS w1,
      |         unnest(ws[2:len(ws)-1]) AS w2,
      |         unnest(ws[3:len(ws)]) AS w3
      |  FROM tok WHERE len(ws) >= 3),
      |pairs AS (
      |  SELECT doc_id, unnest(ws[1:len(ws)-1]) AS a,
      |         unnest(ws[2:len(ws)]) AS b
      |  FROM tok WHERE len(ws) >= 2),
      |c3t AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tri GROUP BY 1, 2, 3),
      |c12 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c12
      |        FROM c3t GROUP BY 1, 2),
      |cb AS (SELECT a, b, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
      |cbw AS (SELECT a AS a2, CAST(SUM(c) AS BIGINT) AS cw FROM cb GROUP BY 1),
      |uni AS (SELECT w, COUNT(*) AS c1
      |        FROM (SELECT unnest(ws) AS w FROM tok) GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
      |        FROM (SELECT unnest(ws) AS w FROM tok)),
      |lp AS (SELECT t.w1, t.w2, t.w3,
      |    CAST(round(ln(CAST(0.6 AS DOUBLE) * t.c3 / c12.c12
      |                  + CAST(0.3 AS DOUBLE) * cb.c / cbw.cw
      |                  + CAST(0.1 AS DOUBLE) * uni.c1 / tot.t)
      |               * 1000000) AS BIGINT) AS lp6
      |  FROM c3t t JOIN c12 USING (w1, w2)
      |    JOIN cb ON cb.a = t.w2 AND cb.b = t.w3
      |    JOIN cbw ON cbw.a2 = t.w2
      |    JOIN uni ON uni.w = t.w3, tot)
      |SELECT doc_id, COUNT(*) AS n_trigrams, CAST(-SUM(lp6) AS BIGINT) AS nll6
      |FROM tri JOIN lp USING (w1, w2, w3) GROUP BY doc_id""".stripMargin) { (s, d) =>
    val tok = docs(s, d).select(col("doc_id"),
      filter(split(col("text"), " "), x => x =!= "").as("ws"))
    val tri = tok.filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 2), i -> struct(
          |  element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2,
          |  element_at(ws, i + 2) AS w3))""".stripMargin)).as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"), col("g.w3"))
    val pairs = tok.filter(size(col("ws")) >= 2)
      .select(explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p")) // r17: codegen pair stream
      .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"))
    val c3t = tri.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))
    val c12 = c3t.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c3")).cast("long").as("c12"))
    val cbt = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val cbw = cbt.groupBy(col("a")).agg(sum(col("c")).cast("long").as("cw"))
      .withColumnRenamed("a", "a2")
    val toksAll = tok.select(explode(col("ws")).as("w"))
    val uni = toksAll.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val tot = toksAll.agg(count(lit(1)).cast("long").as("t"))
    val lp = c3t.join(c12, Seq("w1", "w2"))
      .join(cbt, col("w2") === col("a") && col("w3") === col("b"))
      .join(cbw, col("w2") === col("a2"))
      .join(uni, col("w3") === col("w"))
      .join(broadcast(tot))
      .select(col("w1"), col("w2"), col("w3"),
        round(log(lit(0.6) * col("c3") / col("c12")
          + lit(0.3) * col("c") / col("cw")
          + lit(0.1) * col("c1") / col("t")) * 1000000)
          .cast("long").as("lp6"))
    tri.join(lp, Seq("w1", "w2", "w3"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        (-sum(col("lp6"))).cast("long").as("nll6"))
  }

  /** Jensen–Shannon divergence between each language's unigram
    * distribution and the corpus-global one — the domain-shift /
    * mixture-diagnostic statistic (Lin 1991): JSD(P‖Q) with
    * P = lang distribution, Q = corpus distribution, M = (P+Q)/2.
    * Words ABSENT from the language contribute exactly
    * ½·ln2·(1 − coverage) (their p = 0 term collapses to q·ln 2), so
    * the sum runs only over PRESENT (lang, word) pairs plus one
    * closed-form correction — never a |langs| × |vocab| outer join.
    *
    * Determinism: every per-word term is one fixed IEEE sequence from
    * exact integer counts, quantized to micro-nats (long) before the
    * sum — the q197/q213 rule — and the correction is a single float
    * expression of two exact integers. Scale shape: one token explode,
    * Heaps-bounded (lang, w)/(w) tables, |langs|-row and 1-row
    * broadcasts. */
  val q227JsDivergence: QueryDef = QueryDef(
    "q227_js_divergence",
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |lw AS (SELECT lang, w, COUNT(*) AS clw FROM tok GROUP BY 1, 2),
      |tl AS (SELECT lang, CAST(SUM(clw) AS BIGINT) AS tl FROM lw GROUP BY 1),
      |cw AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY 1),
      |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM tok),
      |terms AS (SELECT lang, cw,
      |    CAST(round((0.5 * (p * ln(p / m) + q * ln(q / m))) * 1000000)
      |         AS BIGINT) AS term6
      |  FROM (SELECT lw.lang, cw.cw, CAST(lw.clw AS DOUBLE) / tl.tl AS p,
      |          CAST(cw.cw AS DOUBLE) / tt.t AS q,
      |          (CAST(lw.clw AS DOUBLE) / tl.tl
      |           + CAST(cw.cw AS DOUBLE) / tt.t) / 2 AS m
      |        FROM lw JOIN tl USING (lang) JOIN cw USING (w), tt)),
      |agg AS (SELECT lang, COUNT(*) AS n_words,
      |    CAST(SUM(term6) AS BIGINT) AS sum6,
      |    CAST(SUM(cw) AS BIGINT) AS sl
      |  FROM terms GROUP BY lang)
      |SELECT lang, CAST(n_words AS BIGINT) AS n_words,
      |  CAST(sum6 + CAST(round(0.5 * ln(2) * (CAST(t - sl AS DOUBLE) / t)
      |                         * 1000000) AS BIGINT) AS BIGINT) AS jsd6
      |FROM agg, tt""".stripMargin) { (s, d) =>
    // the token explode feeds THREE consumers (lang-word counts, word
    // counts, total) — persist it once, materialize the |langs|-row
    // result, then release (the q201 cache discipline)
    val tok = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .persist()
    try {
      val lw = tok.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("clw"))
      val tl = lw.groupBy(col("lang")).agg(sum(col("clw")).cast("long").as("tl"))
      val cw = tok.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val tt = tok.agg(count(lit(1)).cast("long").as("t"))
      val terms = lw.join(broadcast(tl), "lang").join(cw, "w")
        .crossJoin(broadcast(tt))
        .select(col("lang"), col("cw"),
          (col("clw").cast("double") / col("tl")).as("p"),
          (col("cw").cast("double") / col("t")).as("q"))
        .withColumn("m", (col("p") + col("q")) / 2)
        .select(col("lang"), col("cw"),
          expr("cast(round((0.5 * (p * ln(p / m) + q * ln(q / m))) * 1000000) as bigint)")
            .as("term6"))
      val out = terms.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("term6")).cast("long").as("sum6"),
          sum(col("cw")).cast("long").as("sl"))
        .crossJoin(broadcast(tt))
        .select(col("lang"), col("n_words"),
          (col("sum6") + expr(
            "cast(round(0.5 * ln(2) * (cast(t - sl as double) / t) * 1000000) as bigint)"))
            .cast("long").as("jsd6"))
        .persist()
      out.count() // |langs| rows — swept by the harness after use
      out
    } finally tok.unpersist(blocking = true)
  }

  /** Per-language χ² keyword extraction — the classic feature-selection
    * statistic over the (term in language) vs (term elsewhere)
    * contingency table, top 5 terms per language. All four cell counts
    * are exact integers; χ² is ONE fixed IEEE sequence (operands
    * widened to double BEFORE multiplying — a·d at corpus scale
    * overflows BIGINT), quantized to milli-units, and the ranking
    * orders by the QUANTIZED value so cross-engine ties cannot differ
    * by an ulp. Degenerate guards: languages covering the whole corpus
    * and terms covering the whole corpus are excluded (χ² undefined —
    * a zero marginal). Scale shape: one token explode, Heaps-bounded
    * model tables, |langs|-row broadcast, top-k window over the
    * vocab-bounded per-language table. */
  val q231Chi2Keywords: QueryDef = QueryDef(
    "q231_chi2_keywords",
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |lw AS (SELECT lang, w, COUNT(*) AS a FROM tok GROUP BY 1, 2),
      |tl AS (SELECT lang, CAST(SUM(a) AS BIGINT) AS tl FROM lw GROUP BY 1),
      |cw AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY 1),
      |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM tok),
      |cells AS (SELECT lang, w, a, tl - a AS b, cw - a AS c,
      |    (t - tl) - (cw - a) AS d, t
      |  FROM lw JOIN tl USING (lang) JOIN cw USING (w), tt
      |  WHERE tl < t AND cw < t),
      |chi AS (SELECT lang, w, a,
      |    CAST(round(CAST(t AS DOUBLE)
      |        * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
      |        * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
      |        / (CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d))
      |        * 1000) AS BIGINT) AS chi2_milli
      |  FROM cells),
      |r AS (SELECT lang, w, a, chi2_milli,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY chi2_milli DESC, w) AS rk
      |  FROM chi)
      |SELECT lang, w, CAST(a AS BIGINT) AS cnt, chi2_milli,
      |  CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 5""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // three consumers of the token explode — persist once, release
    // after the ≤ 5·|langs|-row result materializes (q201 discipline)
    val tok = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .persist()
    val lw = tok.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("a"))
    val tl = lw.groupBy(col("lang")).agg(sum(col("a")).cast("long").as("tl"))
    val cw = tok.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val tt = tok.agg(count(lit(1)).cast("long").as("t"))
    val cells = lw.join(broadcast(tl), "lang").join(cw, "w")
      .crossJoin(broadcast(tt))
      .filter(col("tl") < col("t") && col("cw") < col("t"))
      .select(col("lang"), col("w"), col("a"),
        (col("tl") - col("a")).as("b"), (col("cw") - col("a")).as("c"),
        (col("t") - col("tl") - (col("cw") - col("a"))).as("d"), col("t"))
    val chi = cells.select(col("lang"), col("w"), col("a"),
      expr("""cast(round(cast(t as double)
             |  * (cast(a as double) * d - cast(b as double) * c)
             |  * (cast(a as double) * d - cast(b as double) * c)
             |  / (cast(a + b as double) * (c + d) * (a + c) * (b + d))
             |  * 1000) as bigint)""".stripMargin).as("chi2_milli"))
    try {
      val out = chi.withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("chi2_milli").desc, col("w"))))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("w"), col("a").cast("long").as("cnt"),
          col("chi2_milli"), col("rk").cast("long").as("rk"))
        .persist()
      out.count() // ≤ 5·|langs| rows — swept by the harness after use
      out
    } finally tok.unpersist(blocking = true)
  }

  /** Mutual information between the lang and source labels — the
    * dependence diagnostic a mixing plan checks before treating two
    * stratification axes as independent (near-zero MI = stratifying by
    * one won't skew the other). I(L;S) = Σ p·ln(p/(pₗ·pₛ)) over the
    * |langs|×|sources| contingency cells; every probability is an
    * exact rational of counts, the per-cell term is ONE fixed IEEE
    * sequence quantized to micro-nats before the (tiny) integer sum —
    * the q227 discipline. One corpus groupBy + broadcast marginals. */
  val q248MutualInfo: QueryDef = QueryDef(
    "q248_mutual_info",
    """WITH c AS (SELECT lang, source, COUNT(*) AS c FROM documents
      |  GROUP BY 1, 2),
      |cl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cl FROM c GROUP BY 1),
      |cs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM c GROUP BY 1),
      |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
      |t AS (SELECT CAST(round((CAST(c.c AS DOUBLE) / n.n)
      |        * ln((CAST(c.c AS DOUBLE) / n.n)
      |             / ((CAST(cl.cl AS DOUBLE) / n.n)
      |                * (CAST(cs.cs AS DOUBLE) / n.n)))
      |        * 1000000) AS BIGINT) AS term6
      |  FROM c JOIN cl USING (lang) JOIN cs USING (source), n)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
      |  CAST(SUM(term6) AS BIGINT) AS mi6
      |FROM t""".stripMargin) { (s, d) =>
    val c = Tables.documents(s, d)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
    val cl = c.groupBy(col("lang")).agg(sum(col("c")).cast("long").as("cl"))
    val cs = c.groupBy(col("source")).agg(sum(col("c")).cast("long").as("cs"))
    val n = c.agg(sum(col("c")).cast("long").as("n"))
    c.join(broadcast(cl), "lang").join(broadcast(cs), "source")
      .crossJoin(broadcast(n))
      .select(expr(
        """cast(round((cast(c as double) / n)
          |  * ln((cast(c as double) / n)
          |       / ((cast(cl as double) / n) * (cast(cs as double) / n)))
          |  * 1000000) as bigint)""".stripMargin).as("term6"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("term6")).cast("long").as("mi6"))
  }

  /** Good–Turing count-of-counts smoothing table (Good 1953; the
    * Simple GT of Gale & Sampson 1995 without the log-linear fit):
    * N_r = number of word types seen exactly r times, adjusted count
    * r* = (r+1)·N_{r+1}/N_r in exact integer ppm (0 where N_{r+1} is
    * empty — the unsmoothed tail the log-linear fit would cover).
    * The N₁/T mass this table yields is the unseen-event probability
    * estimate LM smoothing allocates. Scale shape: one token explode →
    * Heaps-bounded word counts → a count-of-counts table bounded by
    * the MAXIMUM word frequency — tiny; the r+1 lookup is a self-join
    * on that tiny table. */
  val q232GoodTuring: QueryDef = QueryDef(
    "q232_good_turing",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |wc AS (SELECT w, COUNT(*) AS r FROM tok GROUP BY 1),
      |coc AS (SELECT r, COUNT(*) AS n_r FROM wc GROUP BY 1)
      |SELECT a.r, CAST(a.n_r AS BIGINT) AS n_r,
      |  CAST(COALESCE((a.r + 1) * b.n_r * 1000000 // a.n_r, 0) AS BIGINT)
      |    AS r_star_ppm
      |FROM coc a LEFT JOIN coc b ON b.r = a.r + 1""".stripMargin) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
    val wc = tok.groupBy(col("w")).agg(count(lit(1)).as("r"))
    // both sides of the r+1 self-join read coc — persist the tiny
    // (max-word-frequency-bounded) table so the corpus explode under
    // it runs ONCE; swept by the harness after use
    val coc = wc.groupBy(col("r")).agg(count(lit(1)).as("n_r")).persist()
    coc.as("a").join(coc.as("b"), col("b.r") === col("a.r") + 1, "left")
      .select(col("a.r").as("r"), col("a.n_r").as("n_r"),
        coalesce(expr("(a.r + 1) * b.n_r * 1000000L div a.n_r"), lit(0L))
          .as("r_star_ppm"))
  }

  /** Pairwise source-vocabulary Jaccard overlap — the corpus-mixture
    * redundancy diagnostic (how much of source A's vocabulary source B
    * already covers; high overlap between two crawls predicts high
    * near-dup rates before any expensive pair-join runs).
    *
    * Scale shape: the distinct (source, word) stream shuffles on the
    * high-cardinality word; the self-join on `word` emits at most
    * C(|sources|, 2) rows PER WORD (sources are a bounded set, like
    * q238), so the pair exchange is |vocab| × O(|sources|²) — never a
    * corpus cross join. Vocabulary sizes are a |sources|-row broadcast.
    * Exact ppm via integer division, q246 discipline. */
  val q253VocabOverlap: QueryDef = QueryDef(
    "q253_vocab_overlap",
    """WITH sv AS (SELECT DISTINCT source, w FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w
      |    FROM documents) WHERE w <> ''),
      |vs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v
      |  FROM sv GROUP BY 1),
      |i AS (SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_common
      |  FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b, n_common,
      |  CAST(va.v AS BIGINT) AS v_a, CAST(vb.v AS BIGINT) AS v_b,
      |  CAST(n_common * 1000000 // (va.v + vb.v - n_common) AS BIGINT)
      |    AS jacc_ppm
      |FROM i JOIN vs va ON va.source = i.source_a
      |       JOIN vs vb ON vb.source = i.source_b""".stripMargin) { (s, d) =>
    // the distinct (source, word) stream feeds THREE consumers (both
    // self-join sides + the vocab sizes) — persist once, materialize
    // the |sources|²-bounded result, release (q201 cache discipline)
    val sv = docs(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().persist()
    try {
      val vs = sv.groupBy(col("source")).agg(count(lit(1)).as("v"))
      val inter = sv.as("a")
        .join(sv.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_common"))
      val out = inter
        .join(broadcast(vs.select(col("source").as("source_a"), col("v").as("v_a"))), "source_a")
        .join(broadcast(vs.select(col("source").as("source_b"), col("v").as("v_b"))), "source_b")
        .select(col("source_a"), col("source_b"), col("n_common"),
          col("v_a"), col("v_b"),
          expr("n_common * 1000000L div (v_a + v_b - n_common)").as("jacc_ppm"))
        .persist()
      out.count() // |sources|²-bounded — swept by the harness after use
      out
    } finally sv.unpersist(blocking = true)
  }

  /** Held-out perplexity of an add-one-smoothed unigram LM — the
    * standard quality gate for a trained corpus model (CCNet uses the
    * same train-on-corpus/score-held-out loop with a KenLM; the
    * smoothing here is Laplace so the oracle stays closed-form).
    * Train split = doc_id % 10 < 8 (q86's bucket convention), held-out
    * = the rest; p(w) = (c(w)+1)/(T+V+1), unseen words share one
    * smoothed mass bucket.
    *
    * Determinism: ln is quantized to integer micro-nats PER DISTINCT
    * (lang, word) — one `ln` per vocabulary entry, multiplied by the
    * held-out count m — so the cross-entropy sum is exact BIGINT
    * algebra in both engines (the q170/q227 discipline). */
  val q256HeldoutPerplexity: QueryDef = QueryDef(
    "q256_heldout_perplexity",
    """WITH tok AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |tok2 AS (SELECT * FROM tok WHERE w <> ''),
      |cw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok2
      |  WHERE doc_id % 10 < 8 GROUP BY 1),
      |tv AS (SELECT CAST(SUM(c) AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS v FROM cw),
      |hw AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS m FROM tok2
      |  WHERE doc_id % 10 >= 8 GROUP BY 1, 2),
      |terms AS (SELECT lang, m, COALESCE(c, 0) AS c,
      |    CAST(round(ln((COALESCE(c, 0) + 1.0) / (t + v + 1)) * 1000000)
      |         AS BIGINT) AS term6
      |  FROM hw LEFT JOIN cw USING (w), tv)
      |SELECT lang, CAST(SUM(m) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN c = 0 THEN m ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST((-SUM(m * term6)) // SUM(m) AS BIGINT) AS xent6
      |FROM terms GROUP BY lang""".stripMargin) { (s, d) =>
    // the token explode feeds the train-vocabulary counts AND the
    // held-out counts — persist once, materialize the |langs|-row
    // result, release (q227 cache discipline)
    val tok = docs(s, d)
      .select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").persist()
    try {
      val cw = tok.filter(col("doc_id") % 10 < 8)
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val tv = cw.agg(sum(col("c")).cast("long").as("t"),
        count(lit(1)).cast("long").as("v"))
      val hw = tok.filter(col("doc_id") % 10 >= 8)
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("m"))
      val out = hw.join(cw, Seq("w"), "left").crossJoin(broadcast(tv))
        .select(col("lang"), col("m"), coalesce(col("c"), lit(0L)).as("c"),
          expr("cast(round(ln((coalesce(c, 0) + 1.0) / (t + v + 1)) * 1000000) as bigint)")
            .as("term6"))
        .groupBy(col("lang"))
        .agg(sum(col("m")).cast("long").as("n_tokens"),
          sum(when(col("c") === 0, col("m")).otherwise(0L))
            .cast("long").as("n_oov"),
          expr("cast((-sum(m * term6)) div sum(m) as bigint)").as("xent6"))
        .persist()
      out.count() // |langs| rows — swept by the harness after use
      out
    } finally tok.unpersist(blocking = true)
  }

  val all: Seq[QueryDef] =
    Seq(q170UnigramLm, q171EncodingQa, q172ZipfSlope, q174BigramLm,
      q213TrigramJmLm, q227JsDivergence, q231Chi2Keywords, q232GoodTuring,
      q248MutualInfo, q253VocabOverlap, q256HeldoutPerplexity,
      q175TextRank, q176NaiveBayes, q177TfIdf, q196PmiCollocations,
      // headline: the LM-scoring bench representative — two corpus
      // explodes + a Heaps-bounded model join, the axis (corpus-scale
      // string explode → model-table join) no other headliner covers
      q197KneserNey.copy(headline = true), q203CcnetBuckets,
      // headline: the global-rank evaluation shape (ScalableSort over
      // the whole corpus + 1-row rollup)
      q209AucEval.copy(headline = true),
      q209bAucTieCorrected)
}
