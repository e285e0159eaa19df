package graft.tools

/** Incremental-index ingest cost proof (round 12): the streaming
  * index-maintenance surface claims per-batch cost is O(batch), never
  * O(corpus) — the delta-merge posture. This measures it instead of
  * asserting it: the documents table is ingested in `n` equal batches
  * through [[graft.streaming.Ingest.streamLshIngest]] (MinHash-LSH
  * banding segments) and [[graft.streaming.Ingest.streamDupSpanMaintain]]
  * (ExactSubstr window-hash count segments), recording wall seconds
  * per batch. FLAT per-batch cost while the already-ingested corpus
  * grows n× is the O(batch) signature; a rebuild-per-batch design
  * would grow linearly in i (Σ = quadratic).
  *
  * Ends with the read-side consistency counts: candidate pairs over
  * the final segmented LSH index vs a from-scratch rebuild, and the
  * folded dup-hash count vs the batch phase-1 count — both must match
  * exactly (the StreamingSpec contracts, re-checked at this scale).
  *
  * Usage: runMain graft.tools.IncrementalProof <sfDir> <workDir> [nBatches]
  * One JSON line per batch + a summary line.
  */
object IncrementalProof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val work = args.drop(1).headOption.getOrElse("/tmp/incproof")
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val in = s"$work/in"
    val lshIdx = s"$work/lsh-index"
    val spanState = s"$work/span-state"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(work), true)

    val docs = graft.sources.Tables.documents(spark, sfDir)
    for (i <- 0 until n) {
      // batch i arrives as new files in the source dir; each ingest
      // call processes ONLY the new files (AvailableNow + checkpoint)
      docs.filter(pmod(col("doc_id"), lit(n)) === i)
        .write.mode("append").parquet(in)
      // autoCompactSegments = 0: this tool measures INGEST cost — a
      // policy-triggered O(pile) fold inside the timer at nBatches >= 8
      // would corrupt the flat-cost reading it exists to take
      val t0 = System.nanoTime()
      graft.streaming.Ingest.streamLshIngest(spark, in, lshIdx,
        autoCompactSegments = 0)
      val lshSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.streaming.Ingest.streamDupSpanMaintain(spark, in, spanState,
        autoCompactSegments = 0)
      val spanSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"batch":$i,"lshSec":$lshSec%.2f,"spanSec":$spanSec%.2f,"corpusBatchesBefore":$i}""")
    }

    // read-side consistency at full scale (the StreamingSpec contracts)
    val storedPairs = graft.operators.TextPipeline.lshPairsFromBands(
      spark.read.parquet(lshIdx)
        .select(col("doc_id"), col("band"), col("bucket"))).count()
    val directPairs = graft.operators.TextPipeline.lshPairsFromBands(
      graft.operators.TextPipeline.minhashBands(docs)).count()
    val foldedDup = graft.streaming.Ingest.dupHashView(
      spark.read.parquet(spanState)).count()
    val directDup = graft.operators.TextPipeline.dupSpanPartial(docs)
      .filter(col("c") >= 2).count()
    println(s"""{"summary":true,"sfDir":"$sfDir","batches":$n,""" +
      s""""lshPairsStored":$storedPairs,"lshPairsRebuild":$directPairs,""" +
      s""""dupHashesFolded":$foldedDup,"dupHashesRebuild":$directDup,""" +
      s""""consistent":${storedPairs == directPairs && foldedDup == directDup}}""")
    spark.stop()
  }
}
