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
  * Mode `ptr` (r13 VERDICT ask #4) runs the POINTER-state ExactSubstr
  * variant instead ([[graft.streaming.Ingest.streamDupSpanMaintainPtr]]):
  * same per-batch flat-cost protocol, then times the TRUE fold
  * compaction ([[graft.streaming.Ingest.compactDupSpanStatePtrFold]],
  * which pays a corpus pass to re-fetch representative texts) so the
  * deployment trade table in docs/BENCH_NOTES.md carries measured fold
  * costs, not asymptotic claims. Mode `text` also times ITS fold
  * ([[graft.streaming.Ingest.compactDupSpanState]], state-only — no
  * corpus pass) for the same table. Both modes report pile bytes
  * before/after the fold.
  *
  * Mode `ivf` (r17) runs the same flat-cost protocol over the IVF
  * vector pile ([[graft.streaming.Ingest.streamIvfIngest]] on the
  * embeddings table, fixed quantizer), times the rewrite compaction,
  * and checks stored-assignment ≡ rebuild plus probe ≡ batch
  * ivfSearch — the q262 contracts at measurement scale.
  *
  * Modes `post` and `aggmv` (late r17, alongside the q264/q265/q267
  * scored probes): the same flat-cost protocol over the retrieval
  * piles ([[graft.streaming.Ingest.streamPostingsIngest]] plus the
  * q267 tf-postings + doc-stats companions on documents; consistency
  * = merged segments ≡ from-scratch `buildPostings`, the q264
  * bucket-pruned probe ≡ the batch q75 answer, and the pile-served
  * BM25 ≡ the batch q75b ranking) and over the
  * aggregate-MV pile ([[graft.streaming.Ingest.streamAggMaintain]] on
  * events; consistency = the `aggViewOf` fold's (cnt, vsum) ≡ a
  * from-scratch rollup — the HLL column is excluded from the checksum
  * per its estimator property, see SoakProof).
  *
  * Usage: runMain graft.tools.IncrementalProof <sfDir> <workDir> [nBatches] [text|ptr|ivf|post|aggmv]
  * One JSON line per batch + a fold line + a summary line.
  */
object IncrementalProof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val work = args.drop(1).headOption.getOrElse("/tmp/incproof")
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val mode = args.drop(3).headOption.getOrElse("text")
    require(Set("text", "ptr", "ivf", "post", "aggmv")(mode), s"unknown mode $mode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    if (mode == "ivf") { runIvf(spark, sfDir, work, n); spark.stop(); return }
    if (mode == "post") { runPost(spark, sfDir, work, n); spark.stop(); return }
    if (mode == "aggmv") { runAggMv(spark, sfDir, work, n); spark.stop(); return }

    val in = s"$work/in"
    val lshIdx = s"$work/lsh-index"
    val spanState = s"$work/span-state"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    def pileBytes(p: String): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength

    val docs = graft.sources.Tables.documents(spark, sfDir)
    for (i <- 0 until n) {
      // batch i arrives as new files in the source dir; each ingest
      // call processes ONLY the new files (AvailableNow + checkpoint)
      docs.filter(pmod(col("doc_id"), lit(n)) === i)
        .write.mode("append").parquet(in)
      // autoCompactSegments = 0: this tool measures INGEST cost — a
      // policy-triggered O(pile) fold inside the timer at nBatches >= 8
      // would corrupt the flat-cost reading it exists to take; the fold
      // is timed separately below.
      val lshSec = if (mode == "text") {
        val t0 = System.nanoTime()
        graft.streaming.Ingest.streamLshIngest(spark, in, lshIdx,
          autoCompactSegments = 0)
        (System.nanoTime() - t0) / 1e9
      } else -1.0
      val t1 = System.nanoTime()
      if (mode == "text")
        graft.streaming.Ingest.streamDupSpanMaintain(spark, in, spanState,
          autoCompactSegments = 0)
      else
        graft.streaming.Ingest.streamDupSpanMaintainPtr(spark, in, spanState,
          autoCompactSegments = 0)
      val spanSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"mode":"$mode","batch":$i,"lshSec":$lshSec%.2f,"spanSec":$spanSec%.2f,"corpusBatchesBefore":$i}""")
    }

    // fold compaction, timed (the delta-merge cost column of the
    // deployment trade table): text folds state-only; ptr re-fetches
    // every representative's text from the corpus — the corpus pass it
    // pays for the halved state bytes.
    val preFoldBytes = pileBytes(spanState)
    val tf = System.nanoTime()
    if (mode == "text")
      graft.streaming.Ingest.compactDupSpanState(spark, spanState)
    else
      graft.streaming.Ingest.compactDupSpanStatePtrFold(spark, spanState, docs)
    val foldSec = (System.nanoTime() - tf) / 1e9
    val postFoldBytes = pileBytes(spanState)
    println(f"""{"mode":"$mode","fold":true,"foldSec":$foldSec%.2f,"pileBytesPre":$preFoldBytes,"pileBytesPost":$postFoldBytes}""")

    // read-side consistency at full scale (the StreamingSpec contracts)
    if (mode == "text") {
      val storedPairs = graft.operators.TextPipeline.lshPairsFromBands(
        spark.read.parquet(lshIdx)
          .select(col("doc_id"), col("band"), col("bucket"))).count()
      val directPairs = graft.operators.TextPipeline.lshPairsFromBands(
        graft.operators.TextPipeline.minhashBands(docs)).count()
      val foldedDup = graft.streaming.Ingest.dupHashView(
        spark.read.parquet(spanState)).count()
      val directDup = graft.operators.TextPipeline.dupSpanPartial(docs)
        .filter(col("c") >= 2).count()
      println(s"""{"mode":"text","summary":true,"sfDir":"$sfDir","batches":$n,""" +
        s""""lshPairsStored":$storedPairs,"lshPairsRebuild":$directPairs,""" +
        s""""dupHashesFolded":$foldedDup,"dupHashesRebuild":$directDup,""" +
        s""""consistent":${storedPairs == directPairs && foldedDup == directDup}}""")
    } else {
      // the ptr fold's contract: exactly one row per distinct corpus
      // window (the text-state fold's cardinality), and the same
      // duplicated-window count as a from-scratch phase-1 pass. Both
      // counts per side in ONE aggregation pass — persisting the
      // corpus-scale window partial at 100× would be a multi-GB cache
      // for a tool that only needs two longs.
      def rowsAndDups(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)).as("rows"),
          sum(when(col("c") >= 2, 1L).otherwise(0L)).as("dups")).collect()(0)
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      val (foldedRows, foldedDup) = rowsAndDups(spark.read.parquet(spanState))
      val (directRows, directDup) =
        rowsAndDups(graft.operators.TextPipeline.dupSpanPartial(docs))
      println(s"""{"mode":"ptr","summary":true,"sfDir":"$sfDir","batches":$n,""" +
        s""""foldedRows":$foldedRows,"distinctWindowsRebuild":$directRows,""" +
        s""""dupWindowsFolded":$foldedDup,"dupWindowsRebuild":$directDup,""" +
        s""""consistent":${foldedRows == directRows && foldedDup == directDup}}""")
    }
    spark.stop()
  }

  /** The IVF pile's flat-cost + consistency run (mode `ivf`). */
  private def runIvf(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, work: String, n: Int): Unit = {
    import org.apache.spark.sql.functions._
    val in = s"$work/in"
    val idx = s"$work/ivf-index"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    // quantizer fixed upfront from the full table (the IVF ingest
    // contract; rotation is rebuildIvfIndex, timed elsewhere)
    val cent = graft.operators.Similarity.ivfCentroids(emb)
    for (i <- 0 until n) {
      emb.filter(pmod(col("vec_id"), lit(n)) === i)
        .write.mode("append").parquet(in)
      val t0 = System.nanoTime()
      graft.streaming.Ingest.streamIvfIngest(spark, in, idx, cent,
        autoCompactSegments = 0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"mode":"ivf","batch":$i,"ingestSec":$sec%.2f,"corpusBatchesBefore":$i}""")
    }
    def pileBytes(p: String): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    val preBytes = pileBytes(idx)
    val tf = System.nanoTime()
    graft.streaming.Ingest.compactIvfIndex(spark, idx)
    val foldSec = (System.nanoTime() - tf) / 1e9
    println(f"""{"mode":"ivf","fold":true,"foldSec":$foldSec%.2f,""" +
      s""""pileBytesPre":$preBytes,"pileBytesPost":${pileBytes(idx)}}""")
    // consistency: stored assignment ≡ rebuild (count + order-blind
    // checksum, two longs over the driver), probe ≡ batch ivfSearch
    val stored = sig(spark.read.parquet(idx)
      .select(col("vec_id"), col("cid").cast("long").as("cid")))
    val rebuilt = sig(graft.operators.Similarity.ivfAssign(emb, cent)
      .select(col("vec_id"), col("cid")))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probed = sig(graft.streaming.Ingest.ivfProbe(spark, idx, q, nProbe = 4))
    val batch = sig(graft.operators.Similarity.ivfSearch(emb, nProbe = 4,
      centroids = Some(cent)))
    println(s"""{"mode":"ivf","summary":true,"sfDir":"$sfDir","batches":$n,""" +
      s""""storedRows":${stored._1},"rebuildRows":${rebuilt._1},""" +
      s""""assignmentConsistent":${stored == rebuilt},""" +
      s""""probeRows":${probed._1},"probeEqualsBatch":${probed == batch}}""")
    require(stored == rebuilt && probed == batch, "ivf consistency failed")
  }

  /** Order-blind (count, checksum) signature — two longs over the
    * driver regardless of pile size (decimal cast before sum: ANSI
    * BIGINT overflow, see the ivf mode). */
  private def sig(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    import org.apache.spark.sql.functions._
    val h = df.select(xxhash64(df.columns.map(c =>
      col(c).cast("string")): _*).cast("decimal(38,0)").as("h"))
    val r = h.agg(count(lit(1)), sum(col("h"))).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toBigInteger.toString)
  }

  /** The postings pile's flat-cost + consistency run (mode `post`). */
  private def runPost(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, work: String, n: Int): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val in = s"$work/in"
    val idx = s"$work/post-index"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    val tfIdx = s"$work/tf-index"
    val stats = s"$work/doc-stats"
    val docs = graft.sources.Tables.documents(spark, sfDir)
    for (i <- 0 until n) {
      docs.filter(pmod(col("doc_id"), lit(n)) === i)
        .write.mode("append").parquet(in)
      val t0 = System.nanoTime()
      graft.streaming.Ingest.streamPostingsIngest(spark, in, idx,
        autoCompactSegments = 0)
      val sec = (System.nanoTime() - t0) / 1e9
      // the ranked-retrieval companions (q267): tf rows + stats partial
      val t1 = System.nanoTime()
      graft.streaming.Ingest.streamTfPostingsIngest(spark, in, tfIdx,
        autoCompactSegments = 0)
      graft.streaming.Ingest.streamDocStatsIngest(spark, in, stats,
        autoCompactSegments = 0)
      val tfSec = (System.nanoTime() - t1) / 1e9
      println(f"""{"mode":"post","batch":$i,"ingestSec":$sec%.2f,"tfIngestSec":$tfSec%.2f,"corpusBatchesBefore":$i}""")
    }
    def pileBytes(p: String): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    val preBytes = pileBytes(idx)
    val tf = System.nanoTime()
    graft.streaming.Ingest.compactPostings(spark, idx)
    val foldSec = (System.nanoTime() - tf) / 1e9
    val t2 = System.nanoTime()
    graft.streaming.Ingest.compactTfPostings(spark, tfIdx)
    graft.streaming.Ingest.compactDocStats(spark, stats)
    val tfFoldSec = (System.nanoTime() - t2) / 1e9
    println(f"""{"mode":"post","fold":true,"foldSec":$foldSec%.2f,"tfFoldSec":$tfFoldSec%.2f,""" +
      s""""pileBytesPre":$preBytes,"pileBytesPost":${pileBytes(idx)}}""")
    // consistency: merged segments ≡ from-scratch buildPostings
    // (postings arrays stringify deterministically — per-segment lists
    // are disjoint in doc_id and the merge re-sorts), and the q264
    // bucket-pruned probe ≡ the batch q75 answer.
    def postSig(df: org.apache.spark.sql.DataFrame) = sig(df.select(
      col("term"), col("postings").cast("string"), col("df")))
    val merged = postSig(graft.streaming.Ingest.mergePostingsSegments(
      spark.read.parquet(idx).drop("tbucket", "seg")))
    val rebuilt = postSig(graft.operators.InvertedText.buildPostings(docs))
    val terms = Seq("hash", "join")
    val tb = terms.toDF("term")
      .select(pmod(abs(hash(col("term"))), lit(16)).cast("int"))
      .collect().map(_.getInt(0)).distinct.toSeq
    val probed = sig(graft.operators.InvertedText.searchAll(
      graft.streaming.Ingest.mergePostingsSegments(
        spark.read.parquet(idx)
          .filter(col("tbucket").isin(tb: _*))
          .select(col("term"), col("postings"), col("df"))), terms))
    val batch = sig(graft.operators.InvertedText.searchAll(
      graft.operators.InvertedText.buildPostings(docs), terms))
    // the ranked probe (q267's read): pile-served BM25 ≡ from-scratch
    val bmTerms = Seq("hash", "join", "scan")
    val bmProbe = sig(graft.streaming.Ingest.bm25Probe(spark, tfIdx, stats, bmTerms))
    val bmBatch = sig(graft.operators.InvertedText.q75bBm25.fn(spark, sfDir))
    println(s"""{"mode":"post","summary":true,"sfDir":"$sfDir","batches":$n,""" +
      s""""mergedTerms":${merged._1},"rebuildTerms":${rebuilt._1},""" +
      s""""postingsConsistent":${merged == rebuilt},""" +
      s""""probeRows":${probed._1},"probeEqualsBatch":${probed == batch},""" +
      s""""bm25Rows":${bmProbe._1},"bm25EqualsBatch":${bmProbe == bmBatch}}""")
    require(merged == rebuilt && probed == batch && bmProbe == bmBatch,
      "postings consistency failed")
  }

  /** The aggregate-MV pile's flat-cost + consistency run (mode
    * `aggmv`). */
  private def runAggMv(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, work: String, n: Int): Unit = {
    import org.apache.spark.sql.functions._
    val in = s"$work/in"
    val state = s"$work/agg-state"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    val ev = graft.sources.Tables.events(spark, sfDir)
    for (i <- 0 until n) {
      ev.filter(pmod(col("event_id"), lit(n)) === i)
        .write.mode("append").parquet(in)
      val t0 = System.nanoTime()
      graft.streaming.Ingest.streamAggMaintain(spark, in, state,
        autoCompactSegments = 0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"mode":"aggmv","batch":$i,"ingestSec":$sec%.2f,"corpusBatchesBefore":$i}""")
    }
    def pileBytes(p: String): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    val preBytes = pileBytes(state)
    val tf = System.nanoTime()
    graft.streaming.Ingest.compactAggState(spark, state)
    val foldSec = (System.nanoTime() - tf) / 1e9
    println(f"""{"mode":"aggmv","fold":true,"foldSec":$foldSec%.2f,""" +
      s""""pileBytesPre":$preBytes,"pileBytesPost":${pileBytes(state)}}""")
    // consistency: the canonical read view's exact columns ≡ a
    // from-scratch rollup (HLL excluded from the checksum — a unioned
    // sketch estimates via the composite estimator, a direct build via
    // HIP; SoakProof asserts it with tolerance instead)
    def mvSig(df: org.apache.spark.sql.DataFrame) = sig(df.select(
      col("event_type"), col("day").cast("string"), col("cnt"),
      col("vsum").cast("decimal(38,2)").cast("string")))
    val folded = mvSig(graft.streaming.Ingest.aggViewOf(
      spark.read.parquet(state)))
    val rebuilt = mvSig(ev.groupBy(col("event_type"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(30,2)")).as("vsum")))
    println(s"""{"mode":"aggmv","summary":true,"sfDir":"$sfDir","batches":$n,""" +
      s""""foldedGroups":${folded._1},"rebuildGroups":${rebuilt._1},""" +
      s""""mvConsistent":${folded == rebuilt}}""")
    require(folded == rebuilt, "agg-mv consistency failed")
  }
}
