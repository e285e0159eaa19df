package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier
import graft.sources.Tables

/** Contract tests for the GD quality-classifier trainer: monotone
  * loss, bit-determinism across partitionings, bounded feature ranges,
  * and the scale shape (5-row gradient exchange, partial agg). */
class ClassifierSpec extends SparkTestBase {

  private lazy val feat = Classifier.features(Tables.documents(spark, sf)).cache()

  test("features are exact integers in the documented ranges") {
    val bad = feat.select(explode(col("x")).as("v"))
      .filter(col("v") < 0 || col("v") > 1000)
    assert(bad.count() === 0L, "all features scaled into [0, 1000]")
    assert(feat.filter(col("y") =!= 0 && col("y") =!= 1).count() === 0L)
  }

  test("full-batch GD monotonically decreases the exact integer loss") {
    val w1 = Classifier.train(feat, 1)
    val w2 = Classifier.train(feat, 2)
    val w3 = Classifier.train(feat, 3)
    val l0 = Classifier.loss(feat, Array.fill(5)(0L))
    val l1 = Classifier.loss(feat, w1)
    val l2 = Classifier.loss(feat, w2)
    val l3 = Classifier.loss(feat, w3)
    assert(l1 < l0, s"round 1 must reduce loss: $l1 !< $l0")
    assert(l2 < l1, s"round 2 must reduce loss: $l2 !< $l1")
    assert(l3 <= l2, s"round 3 must not increase loss: $l3 !<= $l2")
  }

  test("training is bit-deterministic across partition counts and row order") {
    val w = Classifier.train(feat, 3)
    val shuffled = feat.repartition(7, col("doc_id")).sortWithinPartitions(col("y"))
    val w2 = Classifier.train(shuffled, 3)
    assert(w.toSeq === w2.toSeq,
      "integer-exact gradients must be partitioning-invariant")
  }

  test("gradient exchange is bounded: exactly 5 feature rows aggregate") {
    // the per-round job reduces the corpus to dims rows before any
    // driver materialization — assert the aggregation output is 5 rows
    // and carries decimal(38,0) sums (overflow-free at corpus scale)
    val wlit = array(Array.fill(5)(lit(1L)): _*)
    val g = feat
      .select((aggregate(zip_with(col("x"), wlit, (a, b) => a * b),
        lit(0L), (acc, t) => acc + t) - col("y") * lit(1000000000L)).as("r"),
        posexplode(col("x")).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg(sum((col("r") * col("xi")).cast("decimal(38,0)")).as("g"))
    assert(g.count() === 5L)
    val plan = g.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), "gradient must partial-aggregate")
  }

  test("q211 scores separate above/below threshold consistently") {
    val out = SparkEntry.queries("q211_quality_classifier")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Long]("score9")
      val pred = r.getAs[Long]("pred")
      assert((score > 500000000L) === (pred == 1L),
        s"pred must be the thresholded score: $score -> $pred")
    }
  }
}
