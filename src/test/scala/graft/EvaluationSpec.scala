package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Identity contracts for the evaluation harness (q220/q221/q222):
  * the metrics must satisfy their algebraic relationships regardless
  * of the fixture's classifier quality. */
class EvaluationSpec extends SparkTestBase {

  private lazy val prf = SparkEntry.queries("q220_eval_prf")(spark, sf).head()
  private lazy val n = Tables.documents(spark, sf).count()

  test("confusion counts partition the corpus") {
    val total = prf.getAs[Long]("tp") + prf.getAs[Long]("fp") +
      prf.getAs[Long]("fn") + prf.getAs[Long]("tn")
    assert(total === n)
  }

  test("F1 lies between min and max of precision and recall; accuracy matches counts") {
    val p = prf.getAs[Long]("precision_ppm")
    val r = prf.getAs[Long]("recall_ppm")
    val f1 = prf.getAs[Long]("f1_ppm")
    // harmonic mean: min(p,r) - 1 <= f1 <= max(p,r) + 1 (integer floors)
    assert(f1 >= math.min(p, r) - 1 && f1 <= math.max(p, r) + 1,
      s"F1 $f1 outside [$p, $r]")
    val acc = prf.getAs[Long]("accuracy_ppm")
    val expAcc = (prf.getAs[Long]("tp") + prf.getAs[Long]("tn")) * 1000000L / n
    assert(acc === expAcc)
  }

  test("Cohen's kappa is bounded and chance-corrected below raw accuracy's lift") {
    val row = SparkEntry.queries("q221_cohens_kappa")(spark, sf).head()
    val kappa = row.getAs[Long]("kappa_ppm")
    assert(kappa >= -1000000L && kappa <= 1000000L)
    assert(row.getAs[Long]("n") === n)
    // kappa <= accuracy (both in ppm): chance correction can only shrink
    assert(kappa <= prf.getAs[Long]("accuracy_ppm"))
  }

  test("kappa degenerate cases: constant labels/predictions emit the 0 sentinel; perfect agreement is 1") {
    import spark.implicits._
    import graft.operators.Evaluation
    def k(tp: Long, fp: Long, fn: Long, tn: Long): Long =
      Evaluation.kappaFrom(Seq((tp, fp, fn, tn)).toDF("tp", "fp", "fn", "tn"))
        .head().getAs[Long]("kappa_ppm")
    // N² = pe when labels AND predictions are constant (single-language
    // corpus): κ undefined → 0 sentinel, mirroring q220's guards
    assert(k(100, 0, 0, 0) === 0L, "all-positive corpus, all-positive predictor")
    assert(k(0, 0, 0, 100) === 0L, "all-negative corpus, all-negative predictor")
    // constant predictions over mixed labels: pe = N(tp+fn)+0 — denominator
    // nonzero, κ = 0 by algebra (no information beyond chance)
    assert(k(60, 40, 0, 0) === 0L)
    // perfect agreement on a mixed corpus: κ = 1 (floor-div ppm)
    assert(k(60, 0, 0, 40) === 1000000L)
    // perfect disagreement on a balanced corpus: κ = -1
    assert(k(0, 50, 50, 0) === -1000000L)
  }

  test("calibration bins cover the corpus exactly once, rates bounded") {
    val bins = SparkEntry.queries("q222_calibration")(spark, sf).collect()
    assert(bins.map(_.getAs[Long]("n")).sum === n)
    bins.foreach { b =>
      val rate = b.getAs[Long]("pos_rate_ppm")
      assert(rate >= 0L && rate <= 1000000L)
      val bin = b.getAs[Long]("bin")
      assert(bin >= 0L && bin <= 9L)
      val ms = b.getAs[Long]("mean_score_ppm")
      // bin b holds scores in [25000·b, 25000·(b+1)) except the capped top
      if (bin < 9) assert(ms >= bin * 25000L && ms < (bin + 1) * 25000L)
      else assert(ms >= 225000L)
    }
  }
}
