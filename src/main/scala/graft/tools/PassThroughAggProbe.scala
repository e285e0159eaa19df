package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.functions._

/** Measured note on the reference's auto pass-through aggregation
  * (r13 VERDICT ask #5; reference
  * `/root/reference/dbms/src/Operators/AutoPassThroughHashAggContext.h:23-45`):
  * at runtime the reference detects a map-side hash table that is not
  * reducing cardinality (near-unique grouping keys) and switches to
  * streaming rows through to the exchange, saving the useless table.
  * SURVEY §2.1 accepts Spark's built-in two-phase aggregate as the
  * analog; this tool turns the acceptance into evidence by measuring
  * q60's near-unique-key shape (groupBy md5(text) over documents):
  *
  *  - the map-side REDUCTION RATIO: partial-aggregate output rows ÷
  *    scan rows (≈ 1.0 means the partial table reduced nothing — the
  *    exact regime the reference's pass-through targets);
  *  - wall time of the default two-phase plan vs the closest
  *    API-expressible pass-through emulation — `repartition(key)`
  *    below the aggregate, which moves the exchange under the
  *    aggregation so raw rows stream to the shuffle with NO map-side
  *    hash table (what pass-through does), at the price of the
  *    partial+final pair running co-partitioned above it.
  *
  * OSS Spark 4.1 exposes no `skipPartialAggregate`-style toggle (the
  * jars were grepped — only codegen-internal `partialAggregate*`
  * symbols exist), so the emulation is the honest upper bound on what
  * a runtime bypass could save here.
  *
  * Usage: runMain graft.tools.PassThroughAggProbe [sfDir] [reps]
  */
object PassThroughAggProbe {
  /** Collect every physical node, descending through AQE wrappers:
    * `AdaptiveSparkPlanExec.executedPlan` and each materialized
    * `QueryStageExec.plan` are NOT `children`, so a plain
    * `SparkPlan.collect` stops at stage boundaries and misses the
    * partial aggregate living inside the shuffle's map stage. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case other => Seq(other)
    }
    here ++ p.children.flatMap(allNodes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.sources.Tables.documents(spark, sfDir)
    def twoPhase: DataFrame =
      docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    def passThrough: DataFrame =
      docs.select(md5(col("text")).as("h"), col("doc_id"))
        .repartition(col("h"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

    def timeMedian(mk: => DataFrame): (Double, DataFrame) = {
      var last: DataFrame = null
      val runs = (0 until reps).map { _ =>
        val df = mk
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        last = df
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (runs(reps / 2), last)
    }

    // warmup (codegen/JIT/footers)
    twoPhase.write.format("noop").mode("overwrite").save()
    passThrough.write.format("noop").mode("overwrite").save()

    val (defSec, _) = timeMedian(twoPhase)
    val (ptSec, _) = timeMedian(passThrough)

    // map-side reduction ratio from an executed default plan. NOTE the
    // noop write above executes a SEPARATE QueryExecution (the write
    // command wraps the logical plan), so ITS metrics never land on
    // df.queryExecution's plan instance — drive this one with a
    // collect() on the df itself (Dataset.collect executes the
    // dataset's OWN QueryExecution; count() would wrap it again) so
    // the inspected instance is the one that ran. The partial
    // HashAggregate is identified by its aggregate expressions being
    // in Partial mode.
    val defDf = twoPhase
    defDf.collect()
    val aggs = allNodes(defDf.queryExecution.executedPlan)
      .collect { case h: HashAggregateExec => h }
    val partialOut = aggs.find(_.aggregateExpressions.exists(
        _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial))
      .map(_.metrics("numOutputRows").value).getOrElse(-1L)
    val scanRows = docs.count()
    val distinctKeys = docs.select(md5(col("text"))).distinct().count()

    println(s"""{"probe":"passThroughAgg","sfDir":"$sfDir","reps":$reps,""" +
      f""""scanRows":$scanRows,"distinctKeys":$distinctKeys,""" +
      f""""partialOutRows":$partialOut,""" +
      f""""mapSideReduction":${if (scanRows == 0) 0.0 else partialOut.toDouble / scanRows}%.4f,""" +
      f""""defaultSec":$defSec%.3f,"passThroughEmuSec":$ptSec%.3f}""")
    spark.stop()
  }
}
