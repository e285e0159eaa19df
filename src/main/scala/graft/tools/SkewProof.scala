package graft.tools

import scala.collection.concurrent.TrieMap
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Exact, SkewRemedy}
import graft.sources.Tables

/** Empirical complement of `SkewJoinSpec`'s hash simulation (round-9
  * VERDICT ask #7): run the q252 hot-cold join shape on REAL scaled
  * data twice — once as a plain (key)-partitioned shuffle-hash join,
  * once through [[SkewRemedy.hotColdSaltedJoin]] — and measure, from
  * task metrics, the largest share of any one stage's shuffle-read
  * records landing on a single task.
  *
  * Expected: unsalted, the hot key (≈50% of fact rows by
  * construction) rides ONE hash bucket into one task, so the probe
  * stage's max-task share reads ≈500000 ppm no matter how many tasks
  * the cluster has — the single-straggler signature that stalls a
  * 1000-executor job exactly like a 32-thread one. Salted ×8, each
  * (key, salt) bucket carries ≈1/16 of the fact, so the bound
  * max(hotShare, maxKeyShare/salts) ≈ 62500 ppm + cold noise holds.
  *
  * Usage: runMain graft.tools.SkewProof <sfDir>
  * Prints one JSON line per mode:
  *   {"mode":...,"sec":...,"worstStage":{...},"rows":N}
  * where worstStage is the stage with the highest single-task share
  * among stages that shuffle-read ≥ 1% of the mode's records (small
  * result/rollup stages are reported but can't be the verdict).
  */
object SkewProof {

  private final class StageStats {
    var total = 0L
    var maxTask = 0L
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println("usage: runMain graft.tools.SkewProof <sfDir>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Measure the DISTRIBUTION PROPERTY of key-hash partitioning, not
    // AQE's runtime patches over it. At toy scale AQE's partition
    // coalescing folds the whole (few-MB) shuffle into ONE task in
    // both modes — every stage reads 1000000 ppm and the comparison is
    // meaningless. Coalescing off restores the 32 reducer buckets a
    // real cluster's thousands of reducers are the limit of; skew-join
    // splitting off because it remediates only JOIN probe reads (by
    // duplicating the build side per split) — the salted path under
    // test also bounds the downstream AGGREGATION on the same keys,
    // which AQE cannot split, so the fair unsalted baseline is the
    // plain hash partitioning both stages would see.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    val recording = new AtomicBoolean(false)
    val stages = TrieMap.empty[Int, StageStats]
    // Stage IDs are monotonically increasing within a SparkContext, so
    // a per-run floor (max stage ID seen before the run starts) lets
    // the listener drop straggler TaskEnd events from a PREVIOUS mode
    // that outlive its settle window — without it they'd land in the
    // next mode's freshly-cleared map as phantom stages.
    val stageFloor = new java.util.concurrent.atomic.AtomicInteger(-1)
    val maxStageSeen = new java.util.concurrent.atomic.AtomicInteger(-1)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        maxStageSeen.getAndAccumulate(t.stageId, math.max)
        if (recording.get && t.taskMetrics != null &&
            t.stageId > stageFloor.get) {
          val rec = t.taskMetrics.shuffleReadMetrics.recordsRead
          val s = stages.getOrElseUpdate(t.stageId, new StageStats)
          s.synchronized { s.total += rec; if (rec > s.maxTask) s.maxTask = rec }
        }
      }
    })

    // q252's derived-skew shape: skew_key = 0 for half the keyspace
    // (one hot key with ~50% of all orders), keys 8–15 cold.
    def fact: DataFrame = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"),
        when(col("o_orderkey") % 16 < 8, 0L)
          .otherwise(col("o_orderkey") % 16).as("skew_key"))

    def dim(f: DataFrame): DataFrame = f.groupBy(col("skew_key"))
      .agg(count(lit(1)).as("n_key"), Exact.dsum(col("o_totalprice")).as("sv"))

    def rollup(joined: DataFrame): DataFrame = joined
      .groupBy(col("skew_key"), col("n_key"))
      .agg(count(lit(1)).as("n_joined"),
        sum(when(col("o_totalprice") * col("n_key") > col("sv"), 1L)
          .otherwise(0L)).cast("long").as("n_above_mean"))

    def run(mode: String, joined: => DataFrame): Unit = {
      stages.clear()
      stageFloor.set(maxStageSeen.get) // only stages born in this run count
      recording.set(true)
      val t0 = System.nanoTime()
      val rows = rollup(joined).collect().sortBy(_.getLong(0))
      val sec = (System.nanoTime() - t0) / 1e9
      // Settle BEFORE disabling the gate: late async TaskEnd events
      // posted during the window are exactly what the settle exists to
      // catch (SpillProof's caveat) — closing the gate first drops them.
      Thread.sleep(1000)
      recording.set(false)
      graft.CacheHygiene.sweep(spark, mode)
      val sig = rows.map(r => s"${r.getLong(0)}:${r.getLong(2)}").mkString(",")
      val shuffling = stages.toSeq.filter(_._2.total > 0)
      val grand = shuffling.map(_._2.total).sum
      val detail = shuffling.sortBy(-_._2.total).map { case (id, s) =>
        s"""{"stage":$id,"records":${s.total},"maxTask":${s.maxTask},""" +
          s""""sharePpm":${s.maxTask * 1000000L / math.max(s.total, 1)}}"""
      }
      // verdict stage: highest single-task share among stages carrying
      // ≥1% of this mode's shuffled records (tiny rollups excluded)
      val worst = shuffling.filter(_._2.total * 100 >= grand)
        .map { case (id, s) => (id, s.maxTask * 1000000L / s.total) }
        .sortBy(-_._2).headOption
      println(s"""{"mode":"$mode","sec":${f"$sec%.2f"},""" +
        s""""worstSharePpm":${worst.fold(0L)(_._2)},""" +
        s""""worstStage":${worst.fold(-1)(_._1)},""" +
        s""""resultSig":"$sig","stages":${detail.mkString("[", ",", "]")}}""")
    }

    // Mode A — what a naive engine does: one (key)-hashed shuffle-hash
    // join; the hot key's entire fact share serializes through 1 task.
    run("unsalted", {
      val f = fact; f.join(dim(f).hint("shuffle_hash"), "skew_key")
    })
    // Mode B — the remediation under test.
    run("salted_x8", {
      val f = fact
      SkewRemedy.hotColdSaltedJoin(f, dim(f), Seq("skew_key"),
        hash(col("o_orderkey")), salts = 8, hotShare = 0.2)
    })
    spark.stop()
  }
}
