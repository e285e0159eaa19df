package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Property contracts for the round-8 operators (q226–q241) — the
  * algebraic invariants each must satisfy on ANY input, independent of
  * the oracle hash compare (which pins exact values at one SF). */
class Round8Spec extends SparkTestBase {

  test("q226 ROC curve: cumulative counts are monotone in descending score, ends at totals") {
    val pts = SparkEntry.queries("q226_roc_curve")(spark, sf)
      .orderBy(col("score").desc).collect()
    assert(pts.nonEmpty)
    var lastTp = 0L; var lastFp = 0L
    pts.foreach { r =>
      val tp = r.getAs[Long]("tp"); val fp = r.getAs[Long]("fp")
      assert(tp >= lastTp && fp >= lastFp,
        s"cumulative counts must not decrease: ($lastTp,$lastFp)->($tp,$fp)")
      assert(tp - lastTp + (fp - lastFp) >= 1, "each threshold adds >=1 doc")
      lastTp = tp; lastFp = fp
      assert(r.getAs[Long]("tpr_ppm") <= 1000000L)
      assert(r.getAs[Long]("fpr_ppm") <= 1000000L)
    }
    // the lowest threshold admits everything
    val n = Tables.documents(spark, sf).count()
    assert(lastTp + lastFp === n)
  }

  test("q228 quantile normalization preserves within-language order and maps onto global values") {
    val out = SparkEntry.queries("q228_quantile_normalize")(spark, sf).collect()
    val globalVals = Tables.documents(spark, sf)
      .select(col("n_chars")).collect().map(_.getLong(0)).toSet
    out.foreach(r => assert(globalVals.contains(r.getAs[Long]("norm_chars")),
      "normalized value must be an actual global value (quantile lookup)"))
    // monotone within language: sort by (n_chars, doc_id) → norm non-decreasing
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r =>
        (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("norm_chars") <= b.getAs[Long]("norm_chars"))
        case _ =>
      }
    }
  }

  test("q229 token budget: kept set is a rank prefix and respects the budget") {
    val out = SparkEntry.queries("q229_token_budget_select")(spark, sf).collect()
    val budget = out.map(r => r.getAs[Long]("n_tokens")).sum / 2
    val kept = out.filter(_.getAs[Long]("kept") == 1L)
    val dropped = out.filter(_.getAs[Long]("kept") == 0L)
    assert(kept.map(_.getAs[Long]("cum_tokens")).max <= budget)
    // prefix property: every kept doc outranks (score desc, id asc)
    // every dropped doc
    if (kept.nonEmpty && dropped.nonEmpty) {
      val worstKept = kept.map(r =>
        (-r.getAs[Long]("score"), r.getAs[Long]("doc_id"))).max
      val bestDropped = dropped.map(r =>
        (-r.getAs[Long]("score"), r.getAs[Long]("doc_id"))).min
      assert(Ordering[(Long, Long)].lt(worstKept, bestDropped),
        "kept set must be a contiguous rank prefix")
    }
  }

  test("q230 incremental dedup never drops a doc with zero tile hits and only scores the odd batch") {
    val out = SparkEntry.queries("q230_incremental_dedup")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 2 === 1L, "only the new batch is scored")
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_tiles"))
      if (r.getAs[Long]("n_hit") == 0L) assert(r.getAs[Long]("dropped") === 0L)
    }
  }

  test("q233 stratified folds are balanced within every language (counts differ by <= 1)") {
    val out = SparkEntry.queries("q233_stratified_kfold")(spark, sf)
      .groupBy(col("lang"), col("fold")).count().collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val counts = rows.map(_.getAs[Long]("count"))
      assert(counts.max - counts.min <= 1L,
        s"$lang folds unbalanced: ${counts.mkString(",")}")
    }
  }

  test("q236 MMR: rank-1 is the relevance argmax and later picks trade relevance for diversity") {
    val out = SparkEntry.queries("q236_mmr_topk")(spark, sf)
      .orderBy(col("rk")).collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length === 5,
      "picks must be distinct")
    // rank-1 score (raw relevance) is an upper bound for every later
    // MMR score: score_r = 0.7·rel − 0.3·maxsim ≤ rel ≤ rel_max + eps
    val relMax = out.head.getAs[Double]("mmr6")
    out.tail.foreach(r =>
      assert(r.getAs[Double]("mmr6") <= 0.7 * relMax + 0.3 + 1e-6))
  }

  test("q237 cascade attrition is monotone non-increasing across stages") {
    val out = SparkEntry.queries("q237_cascade_attrition")(spark, sf)
      .orderBy(col("stage")).collect()
    assert(out.length === 5)
    assert(out.head.getAs[Long]("n_surviving") ===
      Tables.documents(spark, sf).count())
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_surviving") <= a.getAs[Long]("n_surviving"))
      case _ =>
    }
  }

  test("q239 OOV rate: token totals partition, vocab docs score below all-OOV docs") {
    val out = SparkEntry.queries("q239_oov_rate")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
      val ppm = r.getAs[Long]("oov_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
    assert(out.map(_.getAs[Long]("n_tokens")).sum ===
      Tables.documents(spark, sf)
        .select(explode(split(col("text"), " "))).count())
  }

  test("q241 label-centroid matrix: strict upper triangle over the label alphabet, dist in [0,2]") {
    val out = SparkEntry.queries("q241_label_centroids")(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf)
      .select(col("label")).distinct().count()
    assert(out.length === (labels * (labels - 1) / 2),
      "one row per unordered label pair")
    out.foreach { r =>
      assert(r.getAs[Int]("l1") < r.getAs[Int]("l2"))
      val dd = r.getAs[Double]("dist")
      assert(dd >= -1e-9 && dd <= 2.0 + 1e-9)
    }
  }
}
