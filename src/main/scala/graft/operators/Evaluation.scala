package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Classifier-evaluation harness — the metrics a data pipeline runs
  * over every trained filter before trusting it at corpus scale:
  * confusion counts with precision/recall/F1, Cohen's κ chance
  * correction, and the calibration (reliability) table. Completes the
  * evaluation family started by q209/q209b (ROC AUC). Beyond the
  * reference's surface (its aggregate set stops at classic OLAP,
  * `/root/reference/dbms/src/AggregateFunctions/`), standard
  * ML-evaluation practice.
  *
  * All three share q209's labeled fixture — pos = (lang = 'en'),
  * score = integer stopword-ppm — and are EXACT integer algebra:
  * F1 uses the single-division form 2·tp·10⁶ div (2·tp + fp + fn)
  * (no nested rounded divisions), κ rides DECIMAL(38,0) (N² exceeds
  * BIGINT at corpus scale), calibration bins are fixed-width integer
  * buckets. Scale shape: each is ONE corpus pass collapsing to a
  * single row (or ≤10 bin rows) via map-side-combined aggregates —
  * nothing keyed by corpus cardinality ever shuffles.
  */
object Evaluation {
  private val thresholdPpm = 60000L

  /** The q209 labeled frame: (doc_id, pos, score). */
  private def labeled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      when(col("lang") === "en", 1).otherwise(0).as("pos"),
      expr("""size(filter(split(trim(text), '\\s+'),
             |  x -> x IN ('the','a','of','and','to'))) * 1000000L
             | div size(split(trim(text), '\\s+'))""".stripMargin).as("score"))

  private val labeledSql =
    """t AS (SELECT doc_id, lang,
      |    string_split_regex(trim(text), '\s+') AS w FROM documents),
      |s AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
      |    len(list_filter(w, x -> list_contains(['the','a','of','and','to'], x)))
      |      * 1000000 // len(w) AS score
      |  FROM t)""".stripMargin

  /** Confusion counts + precision/recall/F1/accuracy at a fixed
    * threshold, integer ppm with zero-division guards. */
  val q220EvalPrf: QueryDef = QueryDef(
    "q220_eval_prf",
    s"""WITH $labeledSql,
       |c AS (SELECT
       |    SUM(CASE WHEN score >= $thresholdPpm AND pos = 1 THEN 1 ELSE 0 END) AS tp,
       |    SUM(CASE WHEN score >= $thresholdPpm AND pos = 0 THEN 1 ELSE 0 END) AS fp,
       |    SUM(CASE WHEN score < $thresholdPpm AND pos = 1 THEN 1 ELSE 0 END) AS fn,
       |    SUM(CASE WHEN score < $thresholdPpm AND pos = 0 THEN 1 ELSE 0 END) AS tn
       |  FROM s)
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       |  CAST(CASE WHEN tp + fp = 0 THEN 0
       |       ELSE tp * 1000000 // (tp + fp) END AS BIGINT) AS precision_ppm,
       |  CAST(CASE WHEN tp + fn = 0 THEN 0
       |       ELSE tp * 1000000 // (tp + fn) END AS BIGINT) AS recall_ppm,
       |  CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
       |       ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END AS BIGINT) AS f1_ppm,
       |  CAST((tp + tn) * 1000000 // (tp + fp + fn + tn) AS BIGINT) AS accuracy_ppm
       |FROM c""".stripMargin) { (s, d) =>
    val pred = labeled(s, d)
      .withColumn("p", (col("score") >= thresholdPpm).cast("long"))
    pred.agg(
      sum(when(col("p") === 1 && col("pos") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("p") === 1 && col("pos") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("p") === 0 && col("pos") === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(col("p") === 0 && col("pos") === 0, 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CASE WHEN tp + fp = 0 THEN 0L ELSE tp * 1000000L div (tp + fp) END")
          .as("precision_ppm"),
        expr("CASE WHEN tp + fn = 0 THEN 0L ELSE tp * 1000000L div (tp + fn) END")
          .as("recall_ppm"),
        expr("CASE WHEN 2 * tp + fp + fn = 0 THEN 0L " +
          "ELSE 2 * tp * 1000000L div (2 * tp + fp + fn) END").as("f1_ppm"),
        expr("(tp + tn) * 1000000L div (tp + fp + fn + tn)").as("accuracy_ppm"))
  }

  /** Cohen's κ — chance-corrected agreement between the thresholded
    * prediction and the label:
    * κ = (N·(tp+tn) − pe) / (N² − pe), pe = (tp+fp)(tp+fn)+(fn+tn)(fp+tn).
    * N² exceeds BIGINT at corpus scale → DECIMAL(38,0) numerators
    * (≡ DuckDB HUGEINT), truncating division, ppm output.
    * Degenerate case: N² = pe exactly when both the labels and the
    * predictions are constant (e.g. a single-language corpus) — κ is
    * undefined there (no chance-corrected information); emit the 0
    * sentinel, mirroring q220's zero-division convention. */
  val q221CohensKappa: QueryDef = QueryDef(
    "q221_cohens_kappa",
    s"""WITH $labeledSql,
       |c AS (SELECT
       |    SUM(CASE WHEN score >= $thresholdPpm AND pos = 1 THEN 1 ELSE 0 END) AS tp,
       |    SUM(CASE WHEN score >= $thresholdPpm AND pos = 0 THEN 1 ELSE 0 END) AS fp,
       |    SUM(CASE WHEN score < $thresholdPpm AND pos = 1 THEN 1 ELSE 0 END) AS fn,
       |    SUM(CASE WHEN score < $thresholdPpm AND pos = 0 THEN 1 ELSE 0 END) AS tn
       |  FROM s)
       |SELECT CAST(tp + fp + fn + tn AS BIGINT) AS n,
       |  CAST(CASE WHEN CAST(tp + fp + fn + tn AS HUGEINT) * (tp + fp + fn + tn)
       |             - (CAST(tp + fp AS HUGEINT) * (tp + fn)
       |                + CAST(fn + tn AS HUGEINT) * (fp + tn)) = 0 THEN 0
       |       ELSE (CAST(tp + fp + fn + tn AS HUGEINT) * (tp + tn)
       |        - (CAST(tp + fp AS HUGEINT) * (tp + fn)
       |           + CAST(fn + tn AS HUGEINT) * (fp + tn))) * 1000000
       |       // (CAST(tp + fp + fn + tn AS HUGEINT) * (tp + fp + fn + tn)
       |           - (CAST(tp + fp AS HUGEINT) * (tp + fn)
       |              + CAST(fn + tn AS HUGEINT) * (fp + tn))) END
       |       AS BIGINT) AS kappa_ppm
       |FROM c""".stripMargin) { (s, d) =>
    kappaFrom(labeled(s, d)
      .withColumn("p", (col("score") >= thresholdPpm).cast("long"))
      .agg(
        sum(when(col("p") === 1 && col("pos") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("p") === 1 && col("pos") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("p") === 0 && col("pos") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("p") === 0 && col("pos") === 0, 1L).otherwise(0L)).as("tn")))
  }

  /** κ from a 1-row confusion frame (tp, fp, fn, tn) — factored so
    * contract tests can plant the degenerate constant-label /
    * constant-prediction cases directly. */
  private[graft] def kappaFrom(counts: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    counts
      .select((col("tp") + col("fp") + col("fn") + col("tn")).as("n"),
        expr(
          s"""CASE WHEN cast(tp + fp + fn + tn as $d38) * (tp + fp + fn + tn)
             |      - (cast(tp + fp as $d38) * (tp + fn)
             |         + cast(fn + tn as $d38) * (fp + tn)) = 0 THEN 0
             |ELSE (cast(tp + fp + fn + tn as $d38) * (tp + tn)
             |  - (cast(tp + fp as $d38) * (tp + fn)
             |     + cast(fn + tn as $d38) * (fp + tn))) * 1000000
             | div (cast(tp + fp + fn + tn as $d38) * (tp + fp + fn + tn)
             |      - (cast(tp + fp as $d38) * (tp + fn)
             |         + cast(fn + tn as $d38) * (fp + tn))) END""".stripMargin)
          .cast("long").as("kappa_ppm"))
  }

  /** Calibration / reliability table: fixed-width score bins
    * (25000-ppm wide, top-capped at bin 9), each with its observed
    * positive rate and mean score — the curve a probability-calibrated
    * scorer should put on the diagonal. */
  val q222Calibration: QueryDef = QueryDef(
    "q222_calibration",
    s"""WITH $labeledSql
       |SELECT least(score // 25000, 9) AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm,
       |  CAST(SUM(score) // COUNT(*) AS BIGINT) AS mean_score_ppm
       |FROM s GROUP BY 1""".stripMargin) { (s, d) =>
    labeled(s, d)
      .groupBy(least(expr("score div 25000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n"),
        expr("sum(pos) * 1000000L div count(1)").as("pos_rate_ppm"),
        expr("sum(score) div count(1)").as("mean_score_ppm"))
  }

  /** The full ROC curve — one (tp, fp, tpr, fpr) point per DISTINCT
    * score threshold (predict positive at score ≥ t), the curve whose
    * trapezoid integral is q209's AUC. Completes the evaluation
    * family: q209 gives the scalar, this gives the operating points a
    * threshold choice needs.
    *
    * Scale shape: scores are integer ppm, so the per-score group table
    * is ≤ 1,000,001 rows by CONSTRUCTION (a constant, independent of
    * corpus size); the cumulative counts still avoid a single-task
    * million-row ORDER BY window via a two-level rollup — ≤ 101
    * 10000-ppm blocks cumulated in one bounded window, plus
    * block-partitioned local windows. */
  val q226RocCurve: QueryDef = QueryDef(
    "q226_roc_curve",
    s"""WITH $labeledSql,
       |g AS (SELECT score, SUM(pos) AS p, COUNT(*) - SUM(pos) AS q
       |  FROM s GROUP BY score),
       |tot AS (SELECT SUM(p) AS tp_all, SUM(q) AS fp_all FROM g),
       |c AS (SELECT score,
       |    SUM(p) OVER (ORDER BY score DESC) AS tp,
       |    SUM(q) OVER (ORDER BY score DESC) AS fp
       |  FROM g)
       |SELECT CAST(score AS BIGINT) AS score,
       |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(CASE WHEN tp_all = 0 THEN 0
       |       ELSE tp * 1000000 // tp_all END AS BIGINT) AS tpr_ppm,
       |  CAST(CASE WHEN fp_all = 0 THEN 0
       |       ELSE fp * 1000000 // fp_all END AS BIGINT) AS fpr_ppm
       |FROM c, tot""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val g = labeled(s, d).groupBy(col("score"))
      .agg(sum(col("pos")).cast("long").as("p"),
        (count(lit(1)) - sum(col("pos"))).cast("long").as("q"))
      .withColumn("blk", expr("score div 10000"))
    val tot = g.agg(sum(col("p")).cast("long").as("tp_all"),
      sum(col("q")).cast("long").as("fp_all"))
    // descending cumulative: block offsets over the ≤101-row block
    // table, then block-local descending windows
    val wBlk = Window.orderBy(col("blk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkOff = g.groupBy(col("blk"))
      .agg(sum(col("p")).as("bp"), sum(col("q")).as("bq"))
      .select(col("blk"),
        coalesce(sum(col("bp")).over(wBlk), lit(0L)).cast("long").as("op"),
        coalesce(sum(col("bq")).over(wBlk), lit(0L)).cast("long").as("oq"))
    val wIn = Window.partitionBy(col("blk")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    g.join(broadcast(blkOff), "blk")
      .select(col("score"),
        (col("op") + sum(col("p")).over(wIn)).cast("long").as("tp"),
        (col("oq") + sum(col("q")).over(wIn)).cast("long").as("fp"))
      .crossJoin(broadcast(tot))
      .select(col("score"), col("tp"), col("fp"),
        expr("CASE WHEN tp_all = 0 THEN 0L ELSE tp * 1000000L div tp_all END")
          .as("tpr_ppm"),
        expr("CASE WHEN fp_all = 0 THEN 0L ELSE fp * 1000000L div fp_all END")
          .as("fpr_ppm"))
  }

  val all: Seq[QueryDef] =
    Seq(q220EvalPrf, q221CohensKappa, q222Calibration, q226RocCurve)
}
