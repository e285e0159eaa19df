package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.QueryDef
import graft.sources.Tables

/** Continuous ingest + MVCC snapshot reads — the Spark mapping of the
  * reference's only write path: Raft learner logs applied to the Delta
  * layer, queried through snapshot-consistent MVCC reads
  * (`/root/reference/dbms/src/Storages/KVStore/`, version filter
  * `Storages/DeltaMerge/DMVersionFilterBlockInputStream.h:32-41,66-67`:
  * rows carry hidden version + delmark; reads keep the newest
  * version <= read_ts and drop delete-marked rows).
  *
  * Mapping (SURVEY §2.6): TiFlash has no user-facing stream operators —
  * the streaming-shaped capability is continuous ingest + consistent
  * snapshot, realized as Structured Streaming `readStream` →
  * `foreachBatch` append of (pk, version, delmark) rows, with the
  * snapshot view as a window query and a compaction job ≙ delta-merge
  * (`DeltaMergeStore_InternalBg.cpp`).
  */
object Ingest {

  /** events → versioned changelog: pk = user_id, version = event_id
    * (monotonic), delmark = 'error' events (demo convention). */
  def versioned(df: DataFrame): DataFrame =
    df.select(
      col("user_id"), col("event_id").as("version"),
      (col("event_type") === "error").as("delmark"),
      col("event_type"), col("value"), col("ts"))

  /** MVCC snapshot at `readTs`: newest surviving version per pk.
    * ≙ DMVersionFilter MVCC mode (COMPACT). The window partitions on
    * the pk — high-cardinality, so this scales as a hash shuffle. */
  def snapshot(versionedDf: DataFrame, readTs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("version").desc)
    versionedDf
      .filter(col("version") <= readTs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && !col("delmark"))
      .drop("rn")
  }

  /** Background compaction POLICY ≙ the reference's GC triggers
    * (`/root/reference/dbms/src/Storages/DeltaMerge/
    * DeltaMergeStore_InternalBg.cpp:572-637`): a segment compacts when
    * MVCC garbage crosses a ratio threshold. Two triggers, mirrored
    * exactly:
    *
    *  - `shouldCompactStableWithTooManyInvalidVersion`: ratio < 1 →
    *    always; no data older than the GC safepoint → never; else
    *    versions > rows·ratio (many superseded versions) or
    *    versions > puts·ratio (many non-effective versions);
    *  - `shouldCompactDeltaWithStable`: nothing delete-ranged → never;
    *    else delete_rows ≥ stable_rows·ratio OR delete_bytes ≥
    *    stable_bytes·ratio — `≥` (not `>`) so an all-delta segment with
    *    stable_rows = 0 still compacts (the small-table edge the
    *    reference comments on).
    */
  object CompactionPolicy {
    final case class SegmentStats(
        numRows: Long, // distinct live pks in the stable snapshot
        numPuts: Long, // non-delete changelog entries
        numVersions: Long, // total changelog entries
        gcHintVersion: Long) // oldest version that GC could reclaim

    def shouldCompactInvalidVersions(
        s: SegmentStats, gcSafepoint: Long, ratio: Double): Boolean =
      if (ratio < 1.0) true
      else if (s.gcHintVersion > gcSafepoint) false
      else s.numVersions > s.numRows * ratio || s.numVersions > s.numPuts * ratio

    def shouldCompactDeleteRange(
        deleteRows: Long, deleteBytes: Long,
        stableRows: Long, stableBytes: Long, ratio: Double): Boolean =
      (deleteRows > 0 || deleteBytes > 0) &&
        (deleteRows >= stableRows * ratio || deleteBytes >= stableBytes * ratio)

    /** Derive the per-table stats the triggers need from a versioned
      * changelog — one aggregate scan (the reference reads them from
      * per-segment properties). */
    def stats(versionedDf: DataFrame): SegmentStats = {
      val r = versionedDf.agg(
        approx_count_distinct(col("user_id")).as("rows"),
        sum(when(!col("delmark"), 1L).otherwise(0L)).as("puts"),
        count(lit(1)).as("versions"),
        min(col("version")).as("gc_hint")).first()
      if (r.isNullAt(2) || r.getLong(2) == 0L) SegmentStats(0, 0, 0, Long.MaxValue)
      else SegmentStats(r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3))
    }
  }

  /** Compaction ≙ background delta-merge: fold the changelog into a
    * stable table holding only live rows at the max version. */
  def compact(versionedDf: DataFrame): DataFrame = {
    val row = versionedDf.agg(max(col("version"))).first()
    // empty changelog → max(version) is NULL; the snapshot is empty at any ts
    val maxV = if (row.isNullAt(0)) Long.MinValue else row.getLong(0)
    snapshot(versionedDf, maxV)
  }

  /** Structured Streaming replay: events parquet → foreachBatch append
    * into a versioned parquet table ≙ Raft apply into the Delta layer.
    * Synchronous for tests (AvailableNow + awaitTermination). */
  def streamIngest(spark: SparkSession, inputDir: String, outPath: String): Unit =
    runAvailableNow(spark, inputDir, s"$outPath-ckpt",
      // same type-conditional ts normalization as Tables.load
      prep = df => versioned(Tables.normalizeEventsTs(df))) {
      (batch, id) => batch.write.mode("overwrite").parquet(seg(outPath, id))
    }

  /** Deterministic per-batch segment directory. Sinks write
    * mode("overwrite") into `seg=<batchId>` instead of appending to
    * the pile root: foreachBatch gives at-least-once delivery (a crash
    * after the sink commit but before the checkpoint commit REPLAYS
    * the batch), and an append sink would then double-count — for the
    * dup-span state that marks the whole replayed batch as duplicated
    * (every window reaches c ≥ 2), for LSH it fabricates self-pairs.
    * Overwriting the batch's own segment makes every sink idempotent —
    * the standard Spark exactly-once discipline. Readers see `seg` as
    * an inferred partition column and ignore it. */
  private def seg(path: String, batchId: Long): String = s"$path/seg=$batchId"

  /** Shared AvailableNow replay scaffolding: schema-inferred parquet
    * stream → optional stream-side transform → foreachBatch sink,
    * synchronous (awaitTermination) so tests see the committed result.
    * perBatch receives the micro-batch AND its batchId so sinks can
    * write idempotently (see [[seg]]). */
  private def runAvailableNow(spark: SparkSession, inputDir: String, ckpt: String,
      prep: DataFrame => DataFrame = identity)(
      perBatch: (DataFrame, Long) => Unit): Unit = {
    val batchSchema = spark.read.parquet(inputDir).schema
    val stream = prep(spark.readStream.schema(batchSchema).parquet(inputDir))
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) => perBatch(batch, id) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
  }

  // ---------------------------------------------------------------
  // Incremental IVF vector index (r16 VERDICT ask #2 — the one
  // surface whose maintenance was batch-only while LSH / ExactSubstr /
  // shingles / postings / agg-MV were all segment-incremental): the
  // delta-merge posture applied to q58's inverted-file ANN index.
  // Reference analog: per-segment vector index build during
  // delta-merge rather than full rebuild
  // (`/root/reference/dbms/src/Storages/DeltaMerge/Index/VectorIndex/`,
  // `DeltaMergeStore_InternalBg.cpp`). The FIXED trained centroid set
  // is the pile's identity — exactly what `_buckets`/`_banding` are to
  // the hash piles: a probe or compactor assigning against different
  // centroids computes incomparable list ids and silently drops
  // matches. The centroids themselves (the trained-model artifact,
  // k ≈ √N rows — broadcast-bounded by the q58 sizing rule) persist as
  // a parquet sibling `<indexPath>-centroids` (like `-ckpt`, outside
  // the promoted root), and their SHA-256 fingerprint rides every
  // promoted generation as the `_centroids` marker; ingest and probe
  // verify sibling-vs-marker before trusting either. Re-clustering for
  // centroid drift is a separate offline rebuild, as in the
  // reference's full index rebuild path.

  /** Order-independent fingerprint of a centroid set: SHA-256 over the
    * sorted (cid, exact float bits) rows. The collect is k rows — the
    * centroid set is broadcast-bounded BY DESIGN (√N-rule sizing,
    * ~80 MB at N = 10¹¹; the assignment crossJoin already broadcasts
    * it), so the driver-side walk is bounded the same way. Exact bit
    * patterns, not decimal renderings: two centroid sets differing in
    * one ULP assign differently and must fingerprint differently. */
  def centroidFingerprint(cent: org.apache.spark.sql.DataFrame): String = {
    val parts = cent.select(col("cid"), col("cv")).collect().map { r =>
      r.getLong(0) + ":" + r.getSeq[Float](1)
        .map(f => java.lang.Float.floatToRawIntBits(f).toHexString).mkString(",")
    }.sorted
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(parts.mkString("\n").getBytes("UTF-8")))
  }

  private def centroidsMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "/_centroids")

  private def centroidSiblingPath(path: String) = s"$path-centroids"

  private def requireConsistentCentroids(spark: SparkSession, path: String,
      fp: String): Unit =
    readMarker(spark, centroidsMarkerPath(path)) match {
      case Some(stored) if stored != fp => throw new java.io.IOException(
        s"IVF index at $path was built against a different centroid set " +
          s"(stored fingerprint $stored, ingest supplied $fp); refusing — " +
          "a mixed-quantizer pile assigns incomparable list ids. Rebuild " +
          "the index to re-train centroids")
      case None if segmentsPresent(spark, path) => throw new java.io.IOException(
        s"IVF index at $path has segments but no _centroids marker; refusing " +
          "to guess the quantizer — restore the marker or rebuild the pile")
      case _ => ()
    }

  /** Read the pile's trained centroid set from its sibling, verifying
    * it against the in-pile `_centroids` fingerprint first — the
    * sibling lives outside the atomically-promoted root, so trusting
    * it unverified would let a swapped/corrupted artifact silently
    * re-route every probe. */
  def readIvfCentroids(spark: SparkSession, indexPath: String): DataFrame = {
    val stored = readMarker(spark, centroidsMarkerPath(indexPath)).getOrElse(
      throw new java.io.IOException(
        s"IVF index at $indexPath has no _centroids marker; nothing to probe"))
    val sib = centroidSiblingPath(indexPath)
    val sibP = new org.apache.hadoop.fs.Path(sib)
    if (!sibP.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(sibP))
      throw new java.io.IOException(
        s"IVF index at $indexPath is marked with centroid fingerprint $stored " +
          s"but its centroid sibling $sib is missing; restore it or rebuild")
    val cent = spark.read.parquet(sib)
    val fp = centroidFingerprint(cent)
    if (fp != stored) throw new java.io.IOException(
      s"centroid sibling $sib (fingerprint $fp) does not match the pile's " +
        s"_centroids marker ($stored); refusing to probe against a swapped " +
        "quantizer — restore the original centroids or rebuild the index")
    cent
  }

  /** Incremental IVF index maintenance ≙ the reference building
    * storage indexes DURING delta-merge rather than rebuilding them:
    * each micro-batch assigns only its NEW vectors to the fixed
    * broadcast centroid set ([[graft.operators.Similarity.ivfAssign]] —
    * a map-side-collapsed min_by, O(batch × k)) and appends them as an
    * immutable cid-partitioned segment. Existing inverted lists are
    * never rewritten; a probe — partition-pruned on cid — sees
    * stream-ingested vectors as soon as their batch commits. Same
    * segment/replay/marker/auto-compaction lifecycle as every other
    * pile; ingest cost per batch is O(batch × k), never O(corpus). */
  def streamIvfIngest(spark: SparkSession, inputDir: String,
      indexPath: String, cent: DataFrame,
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    val fp = centroidFingerprint(cent)
    requireConsistentCentroids(spark, indexPath, fp)
    // artifact before marker, marker before the first segment commit
    // (the r12 ask #2 ordering): a crash at any point leaves a
    // self-describing pile — sibling-only (next ingest re-marks),
    // sibling+marker (ready), never segments without identity
    val sib = centroidSiblingPath(indexPath)
    val sibP = new org.apache.hadoop.fs.Path(sib)
    if (!sibP.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(sibP))
      cent.write.mode("overwrite").parquet(sib)
    writeMarker(spark, centroidsMarkerPath(indexPath), fp)
    runAvailableNow(spark, inputDir, s"$indexPath-ckpt") { (batch, id) =>
      graft.operators.Similarity.ivfAssign(batch, cent)
        .write.mode("overwrite").partitionBy("cid").parquet(seg(indexPath, id))
    }
    if (pileHasData(spark, indexPath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, indexPath),
          autoCompactSegments))
      compactIvfIndex(spark, indexPath)
  }

  /** Compact the IVF pile: assignment rows are immutable per-vector
    * facts (no fold), so compaction rewrites the accumulated
    * small-file segments as one generation per cid partition —
    * read-identical by construction, file-count hygiene only (the
    * Lucene-segment / delta-merge rewrite form, like the LSH and
    * shingle piles). The `_centroids` identity marker rides the temp
    * generation through the atomic promote. */
  def compactIvfIndex(spark: SparkSession, indexPath: String): Unit = {
    val fp = readMarker(spark, centroidsMarkerPath(indexPath)).getOrElse(
      throw new java.io.IOException(
        s"IVF index at $indexPath has no _centroids marker; refusing to compact"))
    requireCheckpointCaughtUp(spark, indexPath)
    promoteCompacted(spark, indexPath) { tmp =>
      spark.read.parquet(indexPath).drop("seg")
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(compactedSeg(tmp))
      writeMarker(spark, centroidsMarkerPath(tmp), fp)
    }
  }

  /** ANN probe against the maintained IVF pile — the production read:
    * per query, the nProbe nearest centroids (an O(|Q| × k) broadcast
    * pass over the verified sibling centroid set) select the inverted
    * lists to scan; the pile read partition-prunes to exactly those
    * cid partitions; candidates rank by exact cosine distance for the
    * final top-k. Semantics ≡ [[graft.operators.Similarity.ivfSearch]]
    * with the same centroids over the same corpus (`StreamingSpec`
    * pins probe-≡-batch; q262 oracles it end-to-end) — the stored
    * index only re-materializes the assignment ivfSearch computes
    * inline, so a probe at any tick sees everything ingested so far.
    * Query cost is |probed lists| ≈ nProbe · N/k rows, never |corpus|. */
  def ivfProbe(spark: SparkSession, indexPath: String, queries: DataFrame,
      nProbe: Int, k: Int = 10): DataFrame = {
    import graft.functions.VectorFunctions.{vec_l2_distance, vec_cosine_distance}
    if (!pileHasData(spark, indexPath))
      return spark.range(0).select(col("id").as("qid"), col("id").as("vec_id"),
        col("id").cast("int").as("rnk"), col("id").cast("double").as("dist"))
    val cent = readIvfCentroids(spark, indexPath)
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cid"))
    val probed = queries.select(col("qid"), col("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("cdist", vec_l2_distance(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))
      .persist()
    try {
      // touched lists are BOUNDED by the centroid count (itself
      // broadcast-bounded by the √N sizing rule), so the collect is a
      // ≤ k-int driver-side set — pushed into the pile scan as
      // partition filters so a probe reads only the lists it can match
      // (the lshProbe touched-partition discipline)
      val touched = probed.select(col("cid")).distinct()
        .collect().map(_.getLong(0))
      val pruned = spark.read.parquet(indexPath)
        .filter(col("cid").isin(touched: _*))
        .select(col("vec_id"), col("embedding"), col("cid"))
      val wRank = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
      // probe side is |Q| × nProbe rows — broadcast it so the
      // corpus-side inverted lists never shuffle (the ivfSearch shape)
      broadcast(probed).join(pruned, Seq("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dist", vec_cosine_distance(col("qv"), col("embedding")))
        .withColumn("rnk", row_number().over(wRank))
        .filter(col("rnk") <= k)
        .select(col("qid"), col("vec_id"), col("rnk"),
          round(col("dist"), 6).as("dist"))
    } finally probed.unpersist(blocking = false)
  }

  /** Offline quantizer rotation ≙ the reference's FULL index rebuild
    * path (re-clustering for centroid drift is a rebuild, not an
    * incremental step — `Storages/DeltaMerge/Index/VectorIndex/`; the
    * same posture this pile documents at [[streamIvfIngest]]): the
    * pile's stored vectors are re-assigned to `newCent` and the pile
    * atomically replaced — the ONLY legal way a pile's quantizer can
    * change, since ingest refuses mixed quantizers. One corpus-pass
    * background job by design (like the ptr fold).
    *
    * Crash-safe at every point, leaning on the probe's fingerprint
    * verification as the fail-safe:
    *  1. the new centroid artifact is STAGED at `<sibling>.next`
    *     (live sibling untouched — aborting here leaves benign
    *     garbage a later rebuild overwrites);
    *  2. [[promoteCompacted]] writes the re-assigned generation WITH
    *     the new `_centroids` fingerprint and promotes atomically;
    *  3. the staged sibling replaces the live one (delete + rename).
    * A crash inside step 3 leaves marker(new) ≠ sibling(old/absent):
    * every probe and ingest REFUSES loudly (never silently
    * mis-assigns), and [[recoverIvfRebuild]] finishes the swap
    * mechanically. */
  def rebuildIvfIndex(spark: SparkSession, indexPath: String,
      newCent: DataFrame): Unit = {
    val fp = centroidFingerprint(newCent)
    requireCheckpointCaughtUp(spark, indexPath)
    val sib = new org.apache.hadoop.fs.Path(centroidSiblingPath(indexPath))
    val next = new org.apache.hadoop.fs.Path(centroidSiblingPath(indexPath) + ".next")
    val fs = sib.getFileSystem(spark.sparkContext.hadoopConfiguration)
    newCent.write.mode("overwrite").parquet(next.toString)
    promoteCompacted(spark, indexPath) { tmp =>
      graft.operators.Similarity.ivfAssign(
          spark.read.parquet(indexPath).select(col("vec_id"), col("embedding")),
          newCent)
        .write.mode("overwrite").partitionBy("cid").parquet(compactedSeg(tmp))
      writeMarker(spark, centroidsMarkerPath(tmp), fp)
    }
    fs.delete(sib, true)
    if (!fs.rename(next, sib)) throw new java.io.IOException(
      s"rebuildIvfIndex: staged centroid swap failed for $next — the pile's " +
        "marker already records the new quantizer, so probes will refuse " +
        "until recoverIvfRebuild (or a manual rename) completes the swap")
  }

  /** Recover an IVF pile after a crash mid-[[rebuildIvfIndex]] step 3
    * (the pile itself is covered by [[recoverCompaction]]): when the
    * promoted marker matches the STAGED `.next` artifact, finish the
    * swap; when marker and live sibling already agree, drop stale
    * staging. Anything else is surfaced loudly. Idempotent; returns
    * the action taken. */
  def recoverIvfRebuild(spark: SparkSession, indexPath: String): String = {
    val sibStr = centroidSiblingPath(indexPath)
    val sib = new org.apache.hadoop.fs.Path(sibStr)
    val next = new org.apache.hadoop.fs.Path(sibStr + ".next")
    val fs = sib.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = readMarker(spark, centroidsMarkerPath(indexPath)).getOrElse(
      throw new java.io.IOException(
        s"recoverIvfRebuild: $indexPath has no _centroids marker — not an IVF pile"))
    def fpOf(p: org.apache.hadoop.fs.Path): Option[String] =
      if (!fs.exists(p)) None
      else Some(centroidFingerprint(spark.read.parquet(p.toString)))
    if (fpOf(sib).contains(marker)) {
      fs.delete(next, true); "consistent"
    } else if (fpOf(next).contains(marker)) {
      fs.delete(sib, true)
      if (!fs.rename(next, sib)) throw new java.io.IOException(
        s"recoverIvfRebuild: rename $next -> $sib failed")
      "swapped-next"
    } else throw new java.io.IOException(
      s"recoverIvfRebuild: neither $sibStr nor its .next staging matches the " +
        s"pile's _centroids marker — restore the trained centroid artifact " +
        "or re-run rebuildIvfIndex with the intended quantizer")
  }

  /** Embedding near-dup at ingest — SemDeDup's candidate generation
    * served from the maintained IVF pile: a NEW batch of embeddings is
    * assigned to the pile's fixed quantizer (O(batch × k), the same
    * map-side min_by ingest pays), candidates are the stored corpus
    * vectors sharing the nearest-centroid LIST (learned blocking — the
    * ANN analog of q54's projection blocks and q61's LSH buckets; the
    * pile read partition-prunes to the batch's touched lists), and an
    * exact cosine confirm keeps only pairs with similarity above
    * `simThreshold`. Output: (new_id, old_id, sim) — the reject/keep
    * decision joins it exactly like the crawl gate's LSH candidates.
    *
    * Scale shape: candidates per new vector ≈ its list's size (N/k —
    * √N under the q58 sizing rule), so the confirm is batch × √N
    * work, never batch × corpus; the batch side grows with the ingest
    * tick, so the join is shuffle_hash on cid (k lists — at the √N
    * rule that is √N-way parallelism), NEVER a broadcast (the q215
    * rule: corpus-growth sets don't broadcast). Recall posture is
    * q58's single-probe IVF curve (SURVEY §2.8) — a near-dup whose
    * pair straddles a list boundary is missed, the documented
    * ANN-blocking trade every SemDeDup deployment makes; exactness
    * contracts stay with the LSH+Jaccard text gate. Deterministic
    * given the pile's centroids, so fully DuckDB-oracled (q263). */
  def ivfNearDupProbe(spark: SparkSession, indexPath: String,
      batchEmb: DataFrame, simThreshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.vec_cosine_distance
    if (!pileHasData(spark, indexPath))
      return spark.range(0).select(col("id").as("new_id"),
        col("id").as("old_id"), col("id").cast("double").as("sim"))
    val cent = readIvfCentroids(spark, indexPath)
    val assigned = graft.operators.Similarity.ivfAssign(batchEmb, cent)
      .select(col("vec_id").as("new_id"), col("embedding").as("nv"), col("cid"))
      .persist()
    try {
      // touched lists bounded by the centroid count (broadcast-bounded
      // by the √N rule) — pushed as partition filters like every probe
      val touched = assigned.select(col("cid")).distinct()
        .collect().map(_.getLong(0))
      val pruned = spark.read.parquet(indexPath)
        .filter(col("cid").isin(touched: _*))
        .select(col("vec_id").as("old_id"), col("embedding").as("ov"), col("cid"))
      val out = assigned.hint("shuffle_hash").join(pruned, Seq("cid"))
        .filter(col("new_id") =!= col("old_id"))
        .withColumn("sim", lit(1.0) - vec_cosine_distance(col("nv"), col("ov")))
        .filter(col("sim") > simThreshold)
        .select(col("new_id"), col("old_id"), round(col("sim"), 6).as("sim"))
        .persist()
      try out.count() // candidate-bounded result; swept by the harness
      catch { case t: Throwable => out.unpersist(blocking = false); throw t }
      out
    } finally assigned.unpersist(blocking = true)
  }

  /** Incremental FULL-TEXT index maintenance, same delta-merge posture
    * as `streamIndexIngest` but for the inverted index: each micro-batch
    * builds postings over its OWN documents only and appends them as an
    * immutable SEGMENT, partitioned by a term-hash bucket. Existing
    * segment files are never rewritten; a term probe partition-prunes to
    * the term's bucket and read-side `mergePostingsSegments` unions the
    * per-segment lists (the Lucene segment model — offline compaction
    * folds segments together, exactly like the reference building
    * storage indexes during delta-merge rather than rebuilding,
    * `DeltaMergeStore_InternalBg.cpp`). Ingest cost per batch is
    * O(batch tokens), never O(corpus). */
  def streamPostingsIngest(spark: SparkSession, inputDir: String,
      indexPath: String, buckets: Int = 16,
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    requireConsistentBuckets(spark, indexPath, buckets)
    // the marker is written BEFORE the first segment can commit (r12
    // VERDICT ask #2): a crash mid-first-ingest then leaves marker +
    // partial segments — still self-describing — instead of a
    // marker-less pile a later ingest would silently re-key
    writeBucketsMarker(spark, indexPath, buckets)
    runAvailableNow(spark, inputDir, s"$indexPath-ckpt") { (batch, id) =>
      graft.operators.InvertedText.buildPostings(batch)
        .withColumn("tbucket", pmod(abs(hash(col("term"))), lit(buckets)))
        .write.mode("overwrite").partitionBy("tbucket").parquet(seg(indexPath, id))
    }
    if (pileHasData(spark, indexPath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, indexPath),
          autoCompactSegments))
      compactPostings(spark, indexPath, buckets)
  }

  /** Incremental TF-POSTINGS pile — the ranked-retrieval (BM25) side
    * of the inverted index (≙ the reference's scored FullTextIndex
    * reads, `Index/FullTextIndex/Reader.h`, maintained per segment
    * during delta-merge like the boolean postings above): each
    * micro-batch stores (term, doc_id, tf, dl) rows for its OWN
    * documents only ([[graft.operators.InvertedText.buildTfPostings]]
    * — dl denormalized so probes never join a corpus-side doc-length
    * table), partitioned by term-hash bucket. doc_ids are
    * batch-disjoint, so segments are append-only facts needing no
    * read-side merge; ingest cost per batch is O(batch tokens), never
    * O(corpus). The corpus-level BM25 constants (N, avgdl) live in the
    * companion [[streamDocStatsIngest]] stats pile. */
  def streamTfPostingsIngest(spark: SparkSession, inputDir: String,
      indexPath: String, buckets: Int = 16,
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    requireConsistentBuckets(spark, indexPath, buckets)
    writeBucketsMarker(spark, indexPath, buckets)
    runAvailableNow(spark, inputDir, s"$indexPath-ckpt") { (batch, id) =>
      graft.operators.InvertedText.buildTfPostings(batch)
        .withColumn("tbucket", pmod(abs(hash(col("term"))), lit(buckets)))
        .write.mode("overwrite").partitionBy("tbucket").parquet(seg(indexPath, id))
    }
    if (pileHasData(spark, indexPath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, indexPath),
          autoCompactSegments))
      compactTfPostings(spark, indexPath)
  }

  /** Compact the tf-postings pile: rows are immutable per-(doc, term)
    * facts (no fold), so compaction rewrites accumulated small-file
    * segments as one generation per tbucket partition — file-count
    * hygiene, read-identical by construction (the LSH/shingle rewrite
    * form). */
  def compactTfPostings(spark: SparkSession, indexPath: String): Unit = {
    val b = readBucketsMarker(spark, indexPath, 16)
    requireCheckpointCaughtUp(spark, indexPath)
    promoteCompacted(spark, indexPath) { tmp =>
      spark.read.parquet(indexPath).drop("seg")
        .repartition(col("tbucket"))
        .write.mode("overwrite").partitionBy("tbucket").parquet(compactedSeg(tmp))
      writeBucketsMarker(spark, tmp, b)
    }
  }

  /** Per-batch corpus-stats partial for BM25's (N, avgdl): document
    * count and total token length — two mergeable sums, the keyless
    * degenerate of [[aggPartial]]'s mergeable-state posture. The
    * token rule is the SAME whitespace split the tf rows use, so
    * total_len ≡ Σ dl by construction. */
  def docStatsPartial(batch: DataFrame): DataFrame =
    batch.select(size(split(trim(col("text")), "\\s+")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))

  /** Read-side fold of doc-stats segments — idempotent (sum of sums),
    * so the compacted single row re-folds unchanged. */
  def docStatsView(segments: DataFrame): DataFrame =
    segments.agg(sum(col("n_docs")).as("n_docs"),
      sum(col("total_len")).as("total_len"))

  /** Incremental BM25 corpus-stats maintenance: each micro-batch
    * appends its 1-row partial; the read view folds by addition
    * (associative + commutative). */
  def streamDocStatsIngest(spark: SparkSession, inputDir: String,
      statePath: String,
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    runAvailableNow(spark, inputDir, s"$statePath-ckpt") { (batch, id) =>
      docStatsPartial(batch).write.mode("overwrite").parquet(seg(statePath, id))
    }
    if (pileHasData(spark, statePath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, statePath),
          autoCompactSegments))
      compactDocStats(spark, statePath)
  }

  /** Collapse the doc-stats pile to its one folded row (read-identical;
    * crash safety via [[promoteCompacted]]). */
  def compactDocStats(spark: SparkSession, statePath: String): Unit = {
    requireCheckpointCaughtUp(spark, statePath)
    promoteCompacted(spark, statePath) { tmp =>
      docStatsView(spark.read.parquet(statePath))
        .write.mode("overwrite").parquet(compactedSeg(tmp))
    }
  }

  /** BM25-ranked retrieval served from the maintained piles — the
    * production recurring read of ranked full-text search on a live
    * crawl: the probed terms' rows come from a term-bucket
    * partition-pruned scan of the tf-postings pile (cost ∝ posting
    * sizes, never corpus size — dl rides each row, so no corpus-side
    * join), df per term is counted over those rows alone, and the
    * corpus constants (N, avgdl) fold from the stats pile's segment
    * partials (a ≤ segments-row read). Scoring math, double
    * determinism (single contribution per (doc, term), FIXED
    * literal-order final sum), and tie ordering are exactly
    * [[graft.operators.InvertedText.q75bBm25]]'s — the probe is
    * oracled by that SQL verbatim (q267). */
  def bm25Probe(spark: SparkSession, indexPath: String, statsPath: String,
      terms: Seq[String], k: Int = 10): DataFrame = {
    if (!pileHasData(spark, indexPath) || !pileHasData(spark, statsPath))
      return spark.range(0).select(col("id").as("doc_id"),
        col("id").as("n_terms"), col("id").cast("double").as("bm25"))
    val b = readBucketsMarker(spark, indexPath, 16)
    import spark.implicits._
    // |terms|-row driver-side bucket computation (the q264 discipline):
    // literals reach the pile scan as partition filters
    val tb = terms.toDF("term")
      .select(pmod(abs(hash(col("term"))), lit(b)).cast("int"))
      .collect().map(_.getInt(0)).distinct.toSeq
    val tf = spark.read.parquet(indexPath)
      .filter(col("tbucket").isin(tb: _*) &&
        col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val st = docStatsView(spark.read.parquet(statsPath))
      .select(col("n_docs").as("n"), col("total_len").as("total"))
    val contrib = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
      (col("tf") * 2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") /
        (col("total").cast("double") / col("n"))))
    val co = tf.join(broadcast(df), "term")
      .crossJoin(broadcast(st))
      .select(col("doc_id"), col("term"), contrib.as("c"))
    def termSum(t: String) =
      coalesce(sum(when(col("term") === t, col("c"))), lit(0.0))
    co.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        round(terms.map(termSum).reduce(_ + _), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Incremental POSITIONAL-postings pile — the phrase/proximity side
    * of the inverted index (the with-positions layout of
    * [[streamTfPostingsIngest]]'s family): each micro-batch stores
    * flat (term, doc_id, pos) occurrence rows for its OWN documents,
    * partitioned by term-hash bucket — append-only immutable facts
    * (batch-disjoint doc_ids, no merge fold), ingest cost O(batch
    * tokens). A phrase probe reads ONLY the probed terms' buckets and
    * runs the adjacency join over those occurrence rows — cost ∝
    * posting sizes, never corpus size. */
  def streamPosPostingsIngest(spark: SparkSession, inputDir: String,
      indexPath: String, buckets: Int = 16,
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    requireConsistentBuckets(spark, indexPath, buckets)
    writeBucketsMarker(spark, indexPath, buckets)
    runAvailableNow(spark, inputDir, s"$indexPath-ckpt") { (batch, id) =>
      batch.select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "term")))
        .withColumn("tbucket", pmod(abs(hash(col("term"))), lit(buckets)))
        .write.mode("overwrite").partitionBy("tbucket").parquet(seg(indexPath, id))
    }
    if (pileHasData(spark, indexPath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, indexPath),
          autoCompactSegments))
      compactPosPostings(spark, indexPath)
  }

  /** Compact the positional pile: occurrence rows are immutable facts
    * (no fold) — the tbucket-partitioned rewrite form. */
  def compactPosPostings(spark: SparkSession, indexPath: String): Unit = {
    val b = readBucketsMarker(spark, indexPath, 16)
    requireCheckpointCaughtUp(spark, indexPath)
    promoteCompacted(spark, indexPath) { tmp =>
      spark.read.parquet(indexPath).drop("seg")
        .repartition(col("tbucket"))
        .write.mode("overwrite").partitionBy("tbucket").parquet(compactedSeg(tmp))
      writeBucketsMarker(spark, tmp, b)
    }
  }

  /** Exact-phrase search served from the maintained positional pile:
    * occurrences of `second` at `first`'s position + 1, both sides
    * read bucket-pruned from stored state (positions are a per-doc
    * property, so segment boundaries are adjacency-invisible). Same
    * semantics as [[graft.operators.InvertedText.searchPhrase]] over
    * a from-scratch index — oracled by q142's SQL verbatim (q269). */
  def phraseProbe(spark: SparkSession, indexPath: String,
      first: String, second: String): DataFrame = {
    if (!pileHasData(spark, indexPath))
      return spark.range(0).select(col("id").as("doc_id"),
        col("id").as("n_occurrences"))
    val b = readBucketsMarker(spark, indexPath, 16)
    import spark.implicits._
    val tb = Seq(first, second).toDF("term")
      .select(pmod(abs(hash(col("term"))), lit(b)).cast("int"))
      .collect().map(_.getInt(0)).distinct.toSeq
    val pruned = spark.read.parquet(indexPath)
      .filter(col("tbucket").isin(tb: _*))
      .select(col("term"), col("doc_id"), col("pos"))
    val a = pruned.filter(col("term") === first)
      .select(col("doc_id"), col("pos").as("pa"))
    val bb = pruned.filter(col("term") === second)
      .select(col("doc_id").as("doc_b"), col("pos").as("pb"))
    a.join(bb, col("doc_id") === col("doc_b") && col("pb") === col("pa") + 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
  }

  /** Incremental MinHash-LSH index maintenance — the delta-merge
    * posture applied to near-dup detection (r11 VERDICT ask #6): each
    * micro-batch computes (doc_id, band, bucket) banding rows for its
    * OWN documents only ([[graft.operators.TextPipeline.minhashBands]]
    * — a document's rows depend on nothing but its own text) and
    * appends them as an immutable segment partitioned by
    * (band, bucket-hash). Existing segments are never rewritten;
    * ingest cost per batch is O(batch shingles), never O(corpus).
    * Reference analog: index build during continuous Delta-layer
    * ingest rather than rebuild
    * (`/root/reference/dbms/src/Storages/DeltaMerge/DeltaMergeStore_Ingest.cpp`).
    *
    * Read side needs NO merge step: candidate pairs come from grouping
    * the segment UNION on (band, bucket)
    * ([[graft.operators.TextPipeline.lshPairsFromBands]]), which is
    * segment-boundary-blind — so batch-incremental maintenance is
    * ≡ a full q61 rebuild by construction (`StreamingSpec` proves it).
    * A new-batch-vs-corpus probe equi-joins the batch's banding rows
    * against the stored index, partition-pruned on (band, bbucket). */
  def streamLshIngest(spark: SparkSession, inputDir: String,
      indexPath: String, buckets: Int = 16,
      numHashes: Int = 16, bandSize: Int = 4,
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    requireConsistentBuckets(spark, indexPath, buckets)
    requireConsistentBanding(spark, indexPath, numHashes, bandSize)
    // markers BEFORE the first segment commit (r12 VERDICT ask #2) —
    // a crash window can no longer produce a marker-less segment pile
    writeBucketsMarker(spark, indexPath, buckets)
    writeBandingMarker(spark, indexPath, numHashes, bandSize)
    runAvailableNow(spark, inputDir, s"$indexPath-ckpt") { (batch, id) =>
      graft.operators.TextPipeline.minhashBands(batch, numHashes, bandSize)
        .withColumn("bbucket", pmod(abs(hash(col("bucket"))), lit(buckets)))
        .write.mode("overwrite").partitionBy("band", "bbucket")
        .parquet(seg(indexPath, id))
    }
    if (pileHasData(spark, indexPath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, indexPath),
          autoCompactSegments))
      compactLshIndex(spark, indexPath, buckets)
  }

  /** The bucket-hash modulus is part of an index's identity: a probe
    * or compactor recomputing it with a different value silently drops
    * matches (rows land in partitions the reader never joins). Persist
    * it as an underscore-prefixed marker (invisible to the parquet
    * reader, like _SUCCESS) and refuse mixed-modulus ingest. */
  private def bucketsMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "/_buckets")

  private def readMarker(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): Option[String] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** Marker writes are crash-atomic and idempotent: a marker's value
    * can never legally change once written (requireConsistent* verified
    * equality first), so an existing marker is left untouched — a
    * truncate-and-rewrite on every tick would open a crash window that
    * leaves a 0-byte marker (and a torn concurrent read could parse a
    * PREFIX of the value, silently dropping matches). Fresh markers are
    * written to a temp sibling and renamed into place.
    *
    * Race hardening (ADVICE r13 #2): requireConsistent* passes on an
    * EMPTY pile, so two concurrent FIRST ingests with different
    * identities both reach this writer — treating the loser as a
    * same-value writer would let it continue ingesting with its own
    * modulus while the pile's marker records the winner's (exactly the
    * silent mixed-modulus state the markers exist to prevent). Every
    * lost race therefore re-reads the surviving marker and refuses
    * loudly unless it matches this writer's intended value. */
  private[graft] def writeMarker(spark: SparkSession,
      p: org.apache.hadoop.fs.Path, content: String): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def verifySurviving(): Unit = {
      val surviving = readMarker(spark, p)
      if (!surviving.contains(content)) throw new java.io.IOException(
        s"marker race at $p: a concurrent first-ingest recorded " +
          s"'${surviving.getOrElse("<missing>")}' where this writer intended " +
          s"'$content' — two ingests with different identities raced on an " +
          "empty pile; pick ONE identity and rebuild before ingesting further")
    }
    // immutable once present — but verify, don't assume: the marker may
    // have appeared between the caller's requireConsistent* check and
    // now (the concurrent-first-ingest window)
    if (fs.exists(p)) { verifySurviving(); return }
    val tmp = new org.apache.hadoop.fs.Path(p.toString + ".tmp")
    val out = fs.create(tmp, true)
    out.write(content.getBytes("UTF-8")); out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, true)
      verifySurviving() // lost the rename race: only a same-value winner is legal
    }
  }

  private def writeBucketsMarker(spark: SparkSession, path: String,
      buckets: Int): Unit =
    writeMarker(spark, bucketsMarkerPath(path), buckets.toString)

  /** Read a pile's bucket-hash modulus. A pile that HAS segments but
    * NO marker is refused loudly (r12 VERDICT ask #2): since markers
    * are written before the first segment can commit, that state means
    * a foreign/corrupted pile — defaulting to the caller's value is
    * exactly the silent mixed-modulus match-dropping the marker exists
    * to prevent. An empty/absent pile returns the caller's value (the
    * marker is about to be created). */
  private def readBucketsMarker(spark: SparkSession, path: String,
      default: Int): Int =
    readMarker(spark, bucketsMarkerPath(path)) match {
      case Some(s) =>
        try s.toInt catch { case _: NumberFormatException =>
          throw new java.io.IOException( // loud, prescriptive — never a bare parse error
            s"corrupt _buckets marker at $path (content: '$s'); restore it or rebuild the pile")
        }
      case None =>
        if (segmentsPresent(spark, path)) throw new java.io.IOException(
          s"index at $path has segments but no _buckets marker; refusing to " +
            "guess the bucket modulus — restore the marker or rebuild the pile")
        default
    }

  private def requireConsistentBuckets(spark: SparkSession, path: String,
      buckets: Int): Unit = {
    val stored = readBucketsMarker(spark, path, buckets)
    if (stored != buckets) throw new java.io.IOException(
      s"index at $path was built with buckets=$stored; refusing ingest with buckets=$buckets")
  }

  /** MinHash banding parameters are part of an LSH index's identity for
    * the same reason the bucket modulus is: a probe banding its batch
    * with different (numHashes, bandSize) computes incomparable bucket
    * keys and silently drops every match. Persisted alongside
    * `_buckets`, enforced on ingest, read (never guessed) by probes. */
  private def bandingMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "/_banding")

  private def writeBandingMarker(spark: SparkSession, path: String,
      numHashes: Int, bandSize: Int): Unit =
    writeMarker(spark, bandingMarkerPath(path), s"$numHashes $bandSize")

  private def readBandingMarker(spark: SparkSession, path: String,
      default: (Int, Int)): (Int, Int) =
    readMarker(spark, bandingMarkerPath(path)) match {
      case Some(s) =>
        try { val parts = s.split("\\s+"); (parts(0).toInt, parts(1).toInt) }
        catch { case _: RuntimeException =>
          throw new java.io.IOException(
            s"corrupt _banding marker at $path (content: '$s'); restore it or rebuild the pile")
        }
      case None =>
        if (segmentsPresent(spark, path)) throw new java.io.IOException(
          s"LSH index at $path has segments but no _banding marker; refusing " +
            "to guess (numHashes, bandSize) — restore the marker or rebuild")
        default
    }

  private def requireConsistentBanding(spark: SparkSession, path: String,
      numHashes: Int, bandSize: Int): Unit = {
    val stored = readBandingMarker(spark, path, (numHashes, bandSize))
    if (stored != ((numHashes, bandSize))) throw new java.io.IOException(
      s"LSH index at $path was built with (numHashes, bandSize)=$stored; " +
        s"refusing ingest with (${numHashes}, ${bandSize})")
  }

  /** seg=N (N ≥ 0) directories currently in a pile — the ingested,
    * not-yet-folded segments. seg=-1 (the compacted generation) is
    * excluded: it never replays and never re-folds uncommitted data. */
  private def segmentIds(spark: SparkSession, path: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
      .filter(_.startsWith("seg="))
      .map(_.stripPrefix("seg=").toLong)
      .filter(_ >= 0L)
  }

  private def segmentsPresent(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("seg="))
  }

  private def segmentCount(spark: SparkSession, path: String): Long =
    segmentIds(spark, path).size.toLong

  /** True iff the pile holds at least one parquet data file. An
    * EMPTY-batch ingest can commit a segment directory with no part
    * files (the write of a 0-partition frame emits only _SUCCESS);
    * probing such a pile must be an empty result, and reading it via
    * spark.read.parquet would throw schema inference errors — so the
    * probes gate on data files, not directory existence. */
  private[streaming] def pileHasData(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) return true
    }
    false
  }

  /** True iff the pile is a single FOLD-compacted generation: seg=-1
    * only AND the fold compactor's `_folded` stamp present. The stamp
    * (not seg-emptiness) is the load-bearing evidence: a REWRITE-form
    * compactor also leaves one seg=-1 generation but keeps per-batch
    * partial rows, so a "single generation ⇒ one row per window"
    * assumption silently under-matches split c=1+c=1 rows (the r14
    * StreamingSpec catch). Probes use this to pick their folded fast
    * path; an unstamped generation always takes the full re-group. */
  private def foldedGeneration(spark: SparkSession, statePath: String): Boolean = {
    if (segmentIds(spark, statePath).nonEmpty) return false
    val m = new org.apache.hadoop.fs.Path(s"$statePath/seg=-1/_folded")
    m.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(m)
  }

  /** Stamp a freshly-written FOLD generation (`gen` = its seg=-1 dir)
    * as fold-shaped — one row per distinct window. Underscore-prefixed
    * so the parquet reader never sees it, written INTO the temp
    * generation so it rides the atomic promote with the data it
    * describes. */
  private def stampFolded(spark: SparkSession, gen: String): Unit = {
    val m = new org.apache.hadoop.fs.Path(s"$gen/_folded")
    m.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(m, true).close()
  }

  /** Segment-pile background-compaction TRIGGER ≙ the reference's
    * delta-layer merge trigger (`shouldSplit`/delta-packs thresholds in
    * `/root/reference/dbms/src/Storages/DeltaMerge/DeltaMergeStore_InternalBg.cpp:572-637`
    * — a segment compacts when accumulated delta crosses a count/size
    * threshold, not on manual demand): a pile folds when its
    * not-yet-compacted segment count reaches `maxSegments`. Invoked at
    * the end of every maintenance tick, so long-running ingest drives
    * its own file-count hygiene; `maxSegments <= 0` disables the
    * trigger (manual-only compaction). */
  object SegmentCompactionPolicy {
    val DefaultMaxSegments = 8
    def shouldCompact(nSegments: Long,
        maxSegments: Int = DefaultMaxSegments): Boolean =
      maxSegments > 0 && nSegments >= maxSegments
  }

  /** Refuse to fold a pile whose newest segment has not been COMMITTED
    * by its stream's checkpoint (ADVICE r12 #1). The at-least-once
    * window — sink committed seg=N, checkpoint commit lost — is
    * harmless to ingest (the restarted stream overwrites seg=N
    * idempotently), but FATAL to a compaction run inside it: the fold
    * absorbs seg=N into seg=-1 and deletes it, then the replay appends
    * a fresh seg=N, double-counting the whole batch (dup-span counts
    * reach c >= 2 for every window, LSH fabricates self-pairs).
    * Spark's commit log (`<ckpt>/commits/<batchId>`) is the durable
    * record of which batches can never replay; compaction requires
    * max committed id >= max seg id. A pile with segments but no
    * commit log at the conventional checkpoint path is refused too —
    * its replay horizon is unknowable. */
  private def requireCheckpointCaughtUp(spark: SparkSession,
      pilePath: String): Unit = {
    val segs = segmentIds(spark, pilePath)
    if (segs.isEmpty) return // only seg=-1 (or nothing): nothing can replay
    val maxSeg = segs.max
    val commits = new org.apache.hadoop.fs.Path(s"$pilePath-ckpt/commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lastCommitted =
      if (!fs.exists(commits)) None
      else fs.listStatus(commits).map(_.getPath.getName).toSeq
        .filter(_.forall(_.isDigit)).map(_.toLong)
        .reduceOption(_ max _)
    if (!lastCommitted.exists(_ >= maxSeg)) throw new java.io.IOException(
      s"compaction: pile $pilePath has segment seg=$maxSeg not yet committed " +
        s"in its checkpoint (last committed: ${lastCommitted.getOrElse("none")}) — " +
        "folding inside the at-least-once replay window would double-count the " +
        "batch on restart; finish or re-run the ingest stream first")
  }

  /** Dedup-at-ingest probe — the production read of the LSH index: a
    * NEW batch of documents is banded (O(batch) work) and equi-joined
    * against the STORED index on (band, bbucket, bucket), yielding
    * (new_doc, old_doc) near-dup candidates without ever re-banding
    * the corpus — the q230 asymmetric new-vs-corpus shape on top of
    * the incremental index. Self-pairs are excluded so an
    * already-ingested document never pairs with itself; buckets larger
    * than
    * `maxBucket` on the index side are skipped as degenerate
    * (boilerplate skew, the q61 cap discipline — bounds join fan-out
    * at cap per probe row regardless of index skew). */
  def lshProbe(spark: SparkSession, indexPath: String, batchDocs: DataFrame,
      maxBucket: Int = 32, refuseDegenerate: Boolean = false): DataFrame = {
    // first-boot ordering: probing a never-created (or created-but-
    // data-less) index is an empty result, not an AnalysisException
    if (!pileHasData(spark, indexPath))
      return spark.range(0)
        .select(col("id").as("new_doc"), col("id").as("old_doc"))
    // modulus AND banding params are part of the index's identity —
    // read the markers, never guess (a mismatched recompute drops
    // matches silently). Segments are present here, so a missing
    // marker throws inside the readers; the defaults are unreachable.
    val b = readBucketsMarker(spark, indexPath, -1)
    val (nh, bs) = readBandingMarker(spark, indexPath, (-1, -1))
    // the banding job is O(batch shingles) — the probe's advertised
    // cost. It feeds TWO consumers (the touched-partition collect and
    // the join's probe side), so persist it for the probe's lifetime
    // or the whole job runs twice (ADVICE r12 #4). Released in the
    // finally (ADVICE r13 #1): a transient executor/IO failure in any
    // of the jobs below must not strand the cache in a long-running
    // per-tick gate loop.
    val probe = graft.operators.TextPipeline.minhashBands(batchDocs, nh, bs)
      .withColumn("bbucket", pmod(abs(hash(col("bucket"))), lit(b)))
      .withColumnRenamed("doc_id", "new_doc")
      .persist()
    try {
      // The batch touches at most nBands × b (band, bbucket) partitions
      // (64 at defaults — grows with those two parameters, fine at any
      // sane config) — collect that BOUNDED set and push it into the
      // index scan as partition filters, so a small batch reads only the
      // partitions it can match instead of aggregating the whole index.
      val touched = probe.select(col("band"), col("bbucket")).distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      val prune = touched
        .map { case (bd, bb) => col("band") === bd && col("bbucket") === bb }
        .reduceOption(_ || _).getOrElse(lit(false))
      val grouped = spark.read.parquet(indexPath).filter(prune)
        .groupBy(col("band"), col("bbucket"), col("bucket"))
        .agg(collect_list(col("doc_id")).as("old_ids"))
      // The degenerate-bucket cap bounds join fan-out under boilerplate
      // skew (the q61 discipline) at the price of RECALL: members of a
      // dropped bucket never reach any downstream confirm step. Callers
      // whose contract is exactness (the crawl capstone's oracle-verified
      // gate) set refuseDegenerate — a touched over-cap bucket then
      // raises loudly instead of silently under-matching, telling the
      // operator to raise the cap or accept the approximation. The guard
      // is FUSED into the probe join (r14 VERDICT ask #2/#3: one action
      // per probe, no separate per-tick count() pass over the touched
      // partitions): an over-cap group poisons its old_ids with
      // raise_error, which fires when the join's single materializing
      // action evaluates the group — the error is unwrapped below into
      // the same prescriptive IOException the separate-pass check threw.
      val idx =
        if (refuseDegenerate) {
          val msg = concat(
            lit(s"$OverCapMarker="),
            lit(s"$maxBucket in $indexPath (a touched (band, bucket) group of "),
            size(col("old_ids")).cast("string"),
            lit(" members) — raise the cap (exactness contract) or probe " +
              "with refuseDegenerate=false (bounded, approximate)"))
          // cast the raise_error branch to old_ids' ACTUAL element type
          // (ADVICE r15 #4): a hardcoded array<bigint> would widen the
          // when/otherwise coercion if the indexed doc_id were ever
          // non-bigint, pushing an implicit coercion onto downstream
          // old_doc comparisons
          grouped.withColumn("old_ids",
            when(size(col("old_ids")) > maxBucket,
              raise_error(msg).cast(grouped.schema("old_ids").dataType))
              .otherwise(col("old_ids")))
        } else grouped.filter(size(col("old_ids")) <= maxBucket)
      // shuffle_hash, NOT broadcast (the q215 rule): the probe side is
      // batch × nBands banding rows (grows with the ingest tick) and the
      // pruned index side is still a corpus FRACTION (touched/total
      // partitions of the whole index) — the static estimator reads both
      // as small, and at a production tick broadcasting either is the
      // 100 TB driver-OOM class. The join keys on the high-cardinality
      // (band, bbucket, bucket), so the shuffle partitions evenly.
      // Materialize the (bounded: candidate-pair-sized) result while the
      // banding cache is alive, then release it; the small persisted
      // result is swept by the harness after use.
      val out = probe.join(idx.hint("shuffle_hash"), Seq("band", "bbucket", "bucket"))
        .select(col("new_doc"), explode(col("old_ids")).as("old_doc"))
        .filter(col("new_doc") =!= col("old_doc"))
        .distinct()
        .persist()
      try out.count()
      catch { case t: Throwable =>
        out.unpersist(blocking = false)
        // the fused guard surfaces as a task-level SparkRuntimeException
        // wrapped by the job failure — re-raise it as the documented
        // prescriptive refusal (API contract unchanged vs the old
        // separate-pass check). The walk is BOUNDED (ADVICE r15 #3:
        // self-referential cause chains are legal and do occur in
        // wrapped executor exceptions — an unbounded takeWhile would
        // hang the error path) and matches the raise_error class/
        // condition in addition to the message text (ADVICE r15 #1:
        // message-only matching is brittle across Spark versions).
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20)
          .flatMap(overCapText)
          .nextOption()
          .foreach(m => throw new java.io.IOException("lshProbe: " + m))
        throw t
      }
      out
    } finally probe.unpersist(blocking = true)
  }

  /** Marker prefix the fused [[lshProbe]] over-cap guard raises with;
    * the probe's materializer unwraps it from the task failure into the
    * prescriptive IOException refusal. */
  private val OverCapMarker = "touched group(s) exceed maxBucket"

  /** Extract the prescriptive over-cap text from one cause-chain link.
    * Primary match is the marker in the message (we control the
    * raise_error payload, so it is always present there today);
    * additionally a [[org.apache.spark.SparkThrowable]] whose error
    * condition is `USER_RAISED_EXCEPTION` is searched through its
    * message PARAMETERS — the class-level match ADVICE r15 #1 asked
    * for, robust to a future Spark changing how raise_error formats
    * getMessage. */
  private def overCapText(c: Throwable): Option[String] = {
    val msg = Option(c.getMessage).getOrElse("")
    if (msg.contains(OverCapMarker))
      Some(msg.substring(msg.indexOf(OverCapMarker)))
    else c match {
      case st: org.apache.spark.SparkThrowable
          if st.getCondition == "USER_RAISED_EXCEPTION" =>
        import scala.jdk.CollectionConverters._
        Option(st.getMessageParameters).toSeq
          .flatMap(_.asScala.values)
          .find(_.contains(OverCapMarker))
          .map(v => v.substring(v.indexOf(OverCapMarker)))
      case _ => None
    }
  }

  // ---------------------------------------------------------------
  // Shingle-set pile (r13 VERDICT ask #3): the crawl gate's near-dup
  // exact confirm needs each candidate PARTNER's distinct 3-gram
  // shingle set. Fetching it by scanning the documents table costs one
  // corpus pass per ingest tick; storing the sets alongside the LSH
  // banding index (maintained in tandem, same micro-batches) turns the
  // fetch into a partition-pruned point read — the same posture as
  // every other probe. Rows are per-document immutable facts
  // (doc_id, sh[]), partitioned by a doc-id hash bucket the fetch
  // prunes on. Reference analog: the delta layer storing per-segment
  // auxiliary index data next to the primary index rather than
  // re-deriving it at query time
  // (`/root/reference/dbms/src/Storages/DeltaMerge/DeltaMergeStore_Ingest.cpp`).

  /** Incremental shingle-set maintenance — one (doc_id, sh) row per
    * >= 3-token document per micro-batch (documents below 3 tokens have
    * no 3-gram shingles and no banding rows; the near-dup gate is
    * DEFINED over >= 3-token docs). Same segment/replay/marker/
    * compaction lifecycle as [[streamLshIngest]]; ingest cost per batch
    * is O(batch tokens), never O(corpus). */
  def streamShingleIngest(spark: SparkSession, inputDir: String,
      pilePath: String, buckets: Int = 16,
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    requireConsistentBuckets(spark, pilePath, buckets)
    writeBucketsMarker(spark, pilePath, buckets)
    runAvailableNow(spark, inputDir, s"$pilePath-ckpt") { (batch, id) =>
      import graft.operators.TextPipeline
      batch.filter(size(TextPipeline.tokens) >= 3)
        .select(col("doc_id"),
          array_distinct(TextPipeline.shingles(TextPipeline.tokens, 3)).as("sh"))
        .withColumn("dbucket", pmod(abs(hash(col("doc_id"))), lit(buckets)))
        .write.mode("overwrite").partitionBy("dbucket").parquet(seg(pilePath, id))
    }
    if (pileHasData(spark, pilePath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, pilePath),
          autoCompactSegments))
      compactShinglePile(spark, pilePath)
  }

  /** Point-read of candidate partners' shingle sets: `ids` (one
    * `old_doc` column, candidate-bounded) is hashed to its touched
    * dbuckets — at most the pile's bucket modulus, collected as a
    * BOUNDED set — and the pile scan is partition-pruned to those
    * buckets before the semi-join. Output: (old_doc, sh). A pile with
    * no data while candidates exist is REFUSED loudly: the empty fetch
    * would silently drop every near-dup confirm (the pile must be
    * maintained in tandem with the LSH index that produced the
    * candidates). */
  def shingleFetch(spark: SparkSession, pilePath: String,
      ids: DataFrame): DataFrame = {
    if (!pileHasData(spark, pilePath)) {
      if (!ids.isEmpty) throw new java.io.IOException(
        s"shingle pile at $pilePath has no data but candidate partners need " +
          "their shingle sets — maintain the pile in tandem with the LSH " +
          "index (streamShingleIngest per micro-batch) or fall back to the " +
          "documents-table fetch")
      return spark.range(0)
        .select(col("id").as("old_doc"),
          array().cast("array<string>").as("sh"))
    }
    val b = readBucketsMarker(spark, pilePath, -1)
    val want = ids.select(col("old_doc")).distinct()
      .withColumn("dbucket", pmod(abs(hash(col("old_doc"))), lit(b)))
      .persist()
    try {
      // touched buckets are bounded by the modulus itself (<= b ints)
      val touched = want.select(col("dbucket")).distinct()
        .collect().map(_.getInt(0))
      val prune = touched.map(col("dbucket") === _)
        .reduceOption(_ || _).getOrElse(lit(false))
      // shuffle_hash (the q215 rule): both sides are corpus-fraction /
      // candidate-scale — the static estimator reads them as tiny at
      // any SF; keep the exchange keyed on the high-cardinality doc id.
      // Materialize (candidate-bounded rows) while the `want` cache is
      // alive; the small persisted result is swept by the caller.
      val out = spark.read.parquet(pilePath).filter(prune)
        .join(want.select(col("old_doc")).hint("shuffle_hash"),
          col("doc_id") === col("old_doc"), "left_semi")
        .select(col("doc_id").as("old_doc"), col("sh"))
        .persist()
      try out.count()
      catch { case t: Throwable => out.unpersist(blocking = false); throw t }
      out
    } finally want.unpersist(blocking = true)
  }

  /** Compact the shingle pile: rows are immutable per-document facts
    * (no fold), so compaction rewrites the accumulated small-file
    * segments as one generation per dbucket partition — read-identical
    * by construction. The `_buckets` marker rides the temp generation
    * through the atomic promote. */
  def compactShinglePile(spark: SparkSession, pilePath: String): Unit = {
    val b = readBucketsMarker(spark, pilePath, 16)
    requireCheckpointCaughtUp(spark, pilePath)
    promoteCompacted(spark, pilePath) { tmp =>
      spark.read.parquet(pilePath).drop("seg")
        .repartition(col("dbucket"))
        .write.mode("overwrite").partitionBy("dbucket").parquet(compactedSeg(tmp))
      writeBucketsMarker(spark, tmp, b)
    }
  }

  /** Incremental ExactSubstr (q215) index maintenance — the
    * delta-merge posture applied to the Lee-et-al dup-span pass: each
    * micro-batch appends its PARTIAL 50-char-window counts keyed on
    * (hash, window TEXT)
    * ([[graft.operators.TextPipeline.dupSpanPartial]]; counts merge by
    * addition like the agg-MV states) as an immutable segment. Ingest
    * cost per batch is O(batch chars), never O(corpus); nothing
    * existing is rewritten. The same asymptotic unit as the paper's
    * suffix array (one entry per char), stored as mergeable aggregate
    * state instead of a monolithic index. See
    * [[streamDupSpanMaintainPtr]] for the pointer-state variant that
    * trades the stored text for probe-time corpus fetches. */
  def streamDupSpanMaintain(spark: SparkSession, inputDir: String,
      statePath: String,
      hashOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_),
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    runAvailableNow(spark, inputDir, s"$statePath-ckpt") { (batch, id) =>
      graft.operators.TextPipeline.dupSpanPartial(batch, hashOf)
        .write.mode("overwrite").parquet(seg(statePath, id))
    }
    if (pileHasData(spark, statePath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, statePath),
          autoCompactSegments))
      compactDupSpanState(spark, statePath)
  }

  /** Fold the window segments to the duplicated-WINDOW set: total
    * count ≥ 2 grouped on (hash, window text) — identical to running
    * q215's phase 1 AND its phase-2 exact confirm over the full
    * history. Counts are exact BIGINTs, so the fold is exact; grouping
    * on g (not hk alone) means two distinct windows colliding on the
    * 64-bit hash can never pool their counts into a false duplicate. */
  def dupHashView(segments: DataFrame): DataFrame =
    segments.groupBy(col("hk"), col("g"))
      .agg(sum(col("c")).cast("long").as("c"))
      .filter(col("c") >= 2).select(col("hk"), col("g"))

  /** Dedup-at-ingest probe for dup spans: mark the MAXIMAL duplicated
    * spans of a NEW batch against everything ingested so far (batch
    * included), re-windowing only the batch — O(batch chars) — and
    * joining its windows against the folded state on (hash, WINDOW
    * TEXT). The text equality is the exact-confirm phase batch q215
    * runs as phase 2 (r12 VERDICT ask #1): a hash-only join fabricates
    * spans at the 100 TB target (~1e14 windows birthday-collide
    * against a multi-billion-key dup set); joining on g as well kills
    * every collision while hk keeps the shuffle keyed on 8 bytes
    * first. Span merge reuses q215's gaps-and-islands kernel, so on a
    * fully-ingested corpus the probe of any doc subset EXACTLY equals
    * the batch q215 rows for those docs (`StreamingSpec` asserts it,
    * plus a planted-collision contract via the `hashOf` seam).
    * `hashOf` must be the SAME function the state was maintained with
    * (it is a test seam, not a tuning knob): a mismatch yields empty
    * joins — never false spans — because the text column still has to
    * match. */
  def dupSpanProbe(spark: SparkSession, statePath: String,
      batchDocs: DataFrame,
      hashOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_)): DataFrame = {
    // first-boot ordering: probing before any maintenance run has
    // created (and populated) the state is an empty result, not an
    // AnalysisException
    val dup =
      if (!pileHasData(spark, statePath))
        spark.range(0).select(col("id").as("hk"), lit("").as("g"))
      else if (foldedGeneration(spark, statePath))
        // the pile is a single FOLD-compacTED generation (seg=-1 only
        // AND carrying the compactor's `_folded` stamp — ADVICE r14 #2:
        // seg-emptiness alone is NOT fold-shaped evidence, exactly as
        // the pointer probe learned when a rewrite-form generation kept
        // split c=1+c=1 rows): the fold's groupBy left exactly one row
        // per (hk, g) with the summed count, so the probe-side re-group
        // is a wasted corpus-scale shuffle — filter and project
        // instead. This is the steady-state production read: piles
        // fold on the compaction policy, so most ticks probe a folded
        // generation. An unstamped single generation falls through to
        // the re-group below — always correct, just not fast-pathed.
        spark.read.parquet(statePath)
          .filter(col("c") >= 2).select(col("hk"), col("g"))
      else dupHashView(spark.read.parquet(statePath))
    val hits = graft.operators.TextPipeline.charWindowHashes(batchDocs, hashOf)
      // corpus-derived: never broadcast (q215 rule)
      .join(dup.hint("shuffle_hash"), Seq("hk", "g"))
      .select(col("doc_id"), col("i"), (col("i") + 49).as("e"))
    graft.operators.TextPipeline.mergeSpans(hits)
  }

  // ---------------------------------------------------------------
  // Pointer-state ExactSubstr variant (the documented scale-out trade
  // of the text-resident state above, r13): the per-batch partial
  // keeps one row per distinct in-batch window TEXT but stores a
  // representative OCCURRENCE pointer (min (doc_id, i)) instead of
  // the 50-char text — 28 bytes per distinct window vs ~66. The
  // probe's exact-confirm then re-fetches each candidate's window
  // text FROM THE CORPUS TABLE (substring at the pointer) and
  // compares — still collision-exact, at the price of one corpus-
  // table pass per probe tick (shuffled on doc_id), where the
  // text-state probe touches nothing but the batch and the folded
  // state. Pick per deployment: state bytes (this variant) vs
  // probe-time corpus IO (the default). Distinct texts colliding on
  // hk remain separate state ROWS (the partial grouped on (hk, g)
  // before dropping g), so counts never pool across a collision.

  /** Pointer-state maintenance; same segment/replay/compaction
    * lifecycle as [[streamDupSpanMaintain]]. Auto-compaction uses the
    * REWRITE form (file-count hygiene — rows are per-(batch, text)
    * facts that cannot fold without the text); the true delta-merge
    * fold is [[compactDupSpanStatePtrFold]], which re-fetches texts
    * from the corpus (an offline background job by design). */
  def streamDupSpanMaintainPtr(spark: SparkSession, inputDir: String,
      statePath: String,
      hashOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_),
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    runAvailableNow(spark, inputDir, s"$statePath-ckpt") { (batch, id) =>
      graft.operators.TextPipeline.dupSpanPartialPtr(batch, hashOf)
        .write.mode("overwrite").parquet(seg(statePath, id))
    }
    if (pileHasData(spark, statePath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, statePath),
          autoCompactSegments))
      compactDupSpanStatePtr(spark, statePath)
  }

  /** Pointer-state dedup-at-ingest probe — semantics identical to
    * [[dupSpanProbe]] (collision-EXACT maximal dup spans of the batch
    * vs everything ingested), mechanics per the trade above: candidate
    * (batch window × state row) pairs meet on the 8-byte hash, each
    * candidate's representative text is fetched from `corpusDocs`
    * (substring at the stored pointer) and compared to the batch
    * window's text, and a window is duplicated iff its CONFIRMED
    * occurrence count reaches 2. `corpusDocs` must be the ingested
    * corpus (batch included) — the pointers index into it. */
  def dupSpanProbePtr(spark: SparkSession, statePath: String,
      corpusDocs: DataFrame, batchDocs: DataFrame,
      hashOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_)): DataFrame = {
    if (!pileHasData(spark, statePath))
      return graft.operators.TextPipeline.mergeSpans(spark.range(0)
        .select(col("id").as("doc_id"), col("id").as("i"), col("id").as("e")))
    // A FOLD-compacted pile has exactly one row per distinct corpus
    // window, so a c = 1 row can never reach the >= 2 confirmed
    // total — filter it out BEFORE the join. This is the same 20×
    // candidate reduction the text-state probe gets from dupHashView's
    // c >= 2 filter, and it is what makes the hash build side bounded
    // at scale: the r14 100× audit run failed this join building a
    // hash relation over the full 192M-row state (~170 MB per task at
    // 32 partitions); the folded filter drops it to the 9.1M-row dup
    // set. The filter is sound ONLY after the FOLD compactor — the
    // REWRITE compactor also leaves one seg=-1 generation but keeps
    // per-batch partial rows (the same window's count may sit as
    // c=1 + c=1 across former segments; StreamingSpec caught exactly
    // this under-match) — so the fold stamps a `_folded` marker into
    // its generation (underscore-prefixed: invisible to the parquet
    // reader, rides the atomic promote) and the probe trusts only it.
    // Non-folded state joins sort-merge — spill-safe at any state
    // size — and is the policy-bounded transient shape anyway (a probe
    // at scale runs against a folded generation).
    val folded = foldedGeneration(spark, statePath)
    val raw = spark.read.parquet(statePath)
      .select(col("hk"), col("o_doc"), col("o_i"), col("c"))
    val st = if (folded) raw.filter(col("c") >= 2) else raw
    // Batch windows as KEYS only (r18, r17 VERDICT ask #4; guide §2.3
    // "shuffle keys and metadata instead of payloads"): the r17 shape
    // carried each batch window's 50-char text `g` through the hk
    // exchange AND the o_doc exchange — ~50 bytes per batch CHARACTER
    // on the wire, twice. The key stream is (doc_id, i, hk) = 24 B/char
    // and both window texts are re-derived for the CANDIDATE subset
    // only, each from one documents-table join.
    val w = graft.operators.TextPipeline.charWindowKeys(batchDocs, hashOf)
    // corpus-derived sides: never broadcast (q215 rule) — candidates
    // meet on the hash, then the text fetches below confirm
    val cand = w.join(st.hint(if (folded) "shuffle_hash" else "merge"), "hk")
    // ONE corpus-text exchange: each candidate fetches its
    // representative's window at the stored pointer; o_text is
    // projected away in the same stage so only the 50-char window
    // survives the join
    val withOld = cand
      .join(corpusDocs.select(col("doc_id").as("o_doc"),
          col("text").as("o_text")).hint("shuffle_hash"), "o_doc")
      .select(col("doc_id"), col("i"), col("c"),
        expr("substring(o_text, o_i, 50)").as("o_win"))
    // one BATCH-text exchange (batch ⊆ corpus — the strictly smaller
    // side) re-derives the candidate's own window; keyed on doc_id, the
    // SAME clustering the confirm groupBy needs, so the aggregation
    // below reuses this exchange instead of adding its own
    val confirmed = withOld
      .join(batchDocs.select(col("doc_id"), col("text")).hint("shuffle_hash"),
        "doc_id")
      .filter(expr("substring(text, i, 50)") === col("o_win"))
    val hits = confirmed.groupBy(col("doc_id"), col("i"))
      .agg(sum(col("c")).cast("long").as("tot"))
      .filter(col("tot") >= 2)
      .select(col("doc_id"), col("i"), (col("i") + 49).as("e"))
    graft.operators.TextPipeline.mergeSpans(hits)
  }

  /** Rewrite-form compaction for the pointer pile: consolidates the
    * accumulated small-file segments into one generation WITHOUT
    * folding (per-(batch, text) rows cannot merge text-free) —
    * read-identical by construction, file-count hygiene only. */
  def compactDupSpanStatePtr(spark: SparkSession, statePath: String): Unit = {
    requireCheckpointCaughtUp(spark, statePath)
    promoteCompacted(spark, statePath) { tmp =>
      spark.read.parquet(statePath).drop("seg")
        .write.mode("overwrite").parquet(compactedSeg(tmp))
    }
  }

  /** Fold-form compaction for the pointer pile — the true delta-merge:
    * collapses the per-batch partial rows to one row per distinct
    * corpus window (exactly the text-state fold's cardinality), keeping
    * the global-minimum representative pointer with the summed count.
    *
    * Restructured per r14 VERDICT observation #1 / ask #2: the r14
    * shape joined corpus TEXT onto EVERY state row and shuffled the
    * full widened set to the group — at 100× that exchange carried all
    * 192M rows with their 50-char texts (89.9 s, +35% over the text
    * fold). The fold now runs state-only first and fetches text only
    * where text can matter:
    *
    *  1. pre-fold state-only on the full pointer identity — (o_doc,
    *     o_i) DETERMINES the window text (substring at the pointer),
    *     so rows sharing (hk, o_doc, o_i) are the same window and
    *     merge text-free. One size-derived exchange on hk alone: hash-
    *     partitioning on hk satisfies the (hk, o_doc, o_i) grouping
    *     (same triple ⇒ same hk partition) AND the per-hk window
    *     below, so the whole phase is a single pile-scale shuffle of
    *     NARROW (28-byte) rows.
    *  2. split on per-hk row multiplicity (window count over hk — no
    *     new exchange): a singleton-hk row is already one-row-per-
    *     window (no other row can be the same window text, because the
    *     same text implies the same hk) and passes through UNCHANGED —
    *     the overwhelming majority (~95% of distinct windows at the
    *     r14 100× measurement).
    *  3. only multi-row hk groups — true duplicates needing a count
    *     merge, plus 64-bit collisions needing disambiguation (the
    *     dup-set-scale minority, 192M → ~9M at 100×) — fetch their
    *     representatives' texts from the corpus, re-group on (hk,
    *     text), min-rep + summed count. The fetch is a SORT-MERGE join
    *     (ADVICE r14 #4: the r14 shuffle_hash built a per-task hash
    *     over the FULL (doc_id, text) corpus at the config-default
    *     partition count — the same fixed-partition memory failure
    *     mode the r14 fix removed from the fold shuffle; sort-merge
    *     spills at any corpus size and this is an offline background
    *     job where bounded memory wins).
    *
    * The pre-fold is staged to a parquet dir inside the temp pile (two
    * consumers — pass-through and fetch — must not recompute the
    * pile-scale phase twice) and deleted before writeTmp returns, so
    * no promoted generation ever contains it: a crash while it exists
    * is a crash inside writeTmp, whose whole tmp dir recovery discards
    * ("live-intact"); the promoted-tmp recovery path only ever sees a
    * completed writeTmp. The name is deliberately NOT dot/underscore-
    * prefixed: Spark 4.1 still reads an explicitly-passed hidden dir
    * but logs "All paths were ignored" while doing it — semantics a
    * future reader could tighten into an EMPTY read, which would
    * silently write an empty folded pile. */
  def compactDupSpanStatePtrFold(spark: SparkSession, statePath: String,
      corpusDocs: DataFrame): Unit = {
    requireCheckpointCaughtUp(spark, statePath)
    promoteCompacted(spark, statePath) { tmp =>
      val staging = s"$tmp/prefold-staging"
      spark.read.parquet(statePath).drop("seg")
        .repartition(foldPartitions(spark, statePath), col("hk"))
        .groupBy(col("hk"), col("o_doc"), col("o_i"))
        .agg(sum(col("c")).cast("long").as("c"))
        .withColumn("nhk",
          count(lit(1)).over(Window.partitionBy(col("hk"))))
        .write.mode("overwrite").parquet(staging)
      val pre = spark.read.parquet(staging)
      pre.filter(col("nhk") === 1)
        .select(col("hk"), col("o_doc"), col("o_i"), col("c"))
        .write.mode("overwrite").parquet(compactedSeg(tmp))
      pre.filter(col("nhk") > 1)
        .select(col("hk"), col("o_doc"), col("o_i"), col("c"))
        .join(corpusDocs.select(col("doc_id").as("o_doc"),
            col("text").as("o_text")).hint("merge"), "o_doc")
        .withColumn("g", expr("substring(o_text, o_i, 50)"))
        .groupBy(col("hk"), col("g"))
        .agg(sum(col("c")).cast("long").as("c"),
          min(struct(col("o_doc"), col("o_i"))).as("rep"))
        .select(col("hk"), col("rep.o_doc").as("o_doc"),
          col("rep.o_i").as("o_i"), col("c"))
        .write.mode("append").parquet(compactedSeg(tmp))
      // the staging delete must be VERIFIED (ADVICE r15 #2): if it
      // silently fails, the staging dir rides the atomic promote into
      // the live pile root and every subsequent read of the pile fails
      // partition discovery (seg=-1 vs prefold-staging conflict).
      // Throwing here discards the whole tmp generation (writeTmp
      // fails → promote never happens) and the live pile stays intact.
      val sp = new org.apache.hadoop.fs.Path(staging)
      val sfs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!sfs.delete(sp, true) && sfs.exists(sp))
        throw new java.io.IOException(
          s"compactDupSpanStatePtrFold: failed to delete prefold staging $staging; " +
            "discarding the tmp generation (a promoted generation must " +
            "contain only its seg=-1 output)")
      // the probe's c >= 2 pre-filter is sound only on fold-shaped
      // output (one row per distinct window) — stamp the generation
      stampFolded(spark, compactedSeg(tmp))
    }
  }

  /** Read-side merge of postings segments: per term, concatenate the
    * per-segment sorted lists and re-sort (each segment is disjoint in
    * doc_id, so this is a k-way list merge), summing document
    * frequency. Equals a from-scratch `buildPostings` over the full
    * corpus. */
  def mergePostingsSegments(segments: DataFrame): DataFrame =
    segments.groupBy(col("term"))
      .agg(sort_array(flatten(collect_list(col("postings")))).as("postings"),
        sum(col("df")).as("df"))

  // ------------------------------------------------------------------
  // Incremental aggregate materialized view (delta-merge for aggregates)

  /** Per-batch PARTIAL aggregate states for the events rollup MV:
    * (event_type, day) → count / exact-decimal value sum. These are
    * the mergeable states the reference ships between MPP stages as
    * `ColumnAggregateFunction` columns
    * (`/root/reference/dbms/src/Columns/ColumnAggregateFunction.h`) —
    * count and sum merge by addition, so segments fold without
    * re-reading the fact stream. */
  def aggPartial(batch: DataFrame): DataFrame =
    batch.groupBy(col("event_type"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(30,2)")).as("vsum"),
        // mergeable DISTINCT state: HLL registers fold by per-register
        // max — associative + commutative, so segments union in any
        // order to the one-shot sketch (≙ uniqRawRes partial states,
        // `AggregateFunctionUniq.h`)
        hll_sketch_agg(col("user_id"), lit(12)).as("users_hll"))

  /** Incremental AGGREGATE-view maintenance, the delta-merge posture
    * applied to a rollup: each micro-batch appends its partial states
    * as an immutable segment; nothing existing is rewritten, so ingest
    * cost per batch is O(batch), never O(history). The read view
    * (`aggViewOf`) folds segments by re-adding the mergeable states —
    * the reference's delta + stable read path; `compactAggState`
    * collapses the segment pile into one, ≙ background delta-merge
    * (`DeltaMergeStore_InternalBg.cpp`). */
  def streamAggMaintain(spark: SparkSession, inputDir: String, statePath: String,
      autoCompactSegments: Int = SegmentCompactionPolicy.DefaultMaxSegments): Unit = {
    runAvailableNow(spark, inputDir, s"$statePath-ckpt",
      prep = df => Tables.normalizeEventsTs(df)) { (batch, id) =>
      aggPartial(batch).write.mode("overwrite").parquet(seg(statePath, id))
    }
    if (pileHasData(spark, statePath) &&
        SegmentCompactionPolicy.shouldCompact(segmentCount(spark, statePath),
          autoCompactSegments))
      compactAggState(spark, statePath)
  }

  /** Fold the partial-state segments into the current MV contents.
    * Identical result to a from-scratch groupBy over the full history;
    * the fold input is segments × groups, not the event history. */
  def aggViewOf(segments: DataFrame): DataFrame =
    segments.groupBy(col("event_type"), col("day"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("vsum")).as("vsum"),
        hll_union_agg(col("users_hll")).as("users_hll"))

  /** Background compaction: rewrite the segment pile as ONE folded
    * segment. Read-side results are unchanged (fold is associative);
    * crash safety via [[promoteCompacted]]'s atomic promote. */
  def compactAggState(spark: SparkSession, statePath: String): Unit = {
    requireCheckpointCaughtUp(spark, statePath)
    promoteCompacted(spark, statePath) { tmp =>
      aggViewOf(spark.read.parquet(statePath))
        .write.mode("overwrite").parquet(compactedSeg(tmp))
    }
  }

  /** The compacted generation lives in its own `seg=-1` segment so the
    * pile keeps one consistent partition layout: post-compaction
    * ingest appends seg=<batchId> (batch ids are never negative)
    * alongside it, and partition discovery keeps working. */
  private def compactedSeg(tmp: String): String = s"$tmp/seg=-1"

  /** Atomic segment-pile replacement shared by every compactor: the
    * folded generation is fully written to a sibling temp path FIRST,
    * then promoted with two filesystem renames. The live pile is never
    * deleted before the replacement is durable — a crash mid-compaction
    * leaves either the old generation live (crash before promote) or
    * parked at `<path>.compact-old` (crash between renames; recovery =
    * rename it back or re-promote the committed temp). ≙ the
    * reference's atomic segment replacement in delta-merge
    * (`DeltaMergeStore_InternalBg.cpp`). */
  private def promoteCompacted(spark: SparkSession, livePath: String)(
      writeTmp: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val tmpPath = livePath + ".compact-tmp"
    val live = new Path(livePath)
    val tmp = new Path(tmpPath)
    val old = new Path(livePath + ".compact-old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Concurrent-append guard: compaction and ingest are meant to be
    // serialized by the maintenance driver (the reference's delta-merge
    // lock discipline), but a scheduling bug here would SILENTLY drop
    // the segments a concurrent batch appended between the fold's read
    // and the demote rename. Snapshot the segment listing before the
    // fold and refuse to promote if it changed — losing a compaction
    // attempt is cheap, losing ingested data is not.
    def segListing(): Set[String] =
      if (!fs.exists(live)) Set.empty
      else fs.listStatus(live).map(_.getPath.getName).toSet
    val before = segListing()
    writeTmp(tmpPath)
    if (segListing() != before) {
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"compaction: concurrent append detected under $live — retry when ingest is quiesced")
    }
    fs.delete(old, true)
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"compaction: demote failed for $live")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live) // roll back so the pile stays readable
      throw new java.io.IOException(s"compaction: promote failed for $tmp")
    }
    fs.delete(old, true)
  }

  /** Recover a segment pile after a crash mid-[[promoteCompacted]] —
    * the executable form of the choreography's recovery contract.
    * States, in program order of the promote:
    *  - live exists (crash before demote, or after completion): the
    *    pile is authoritative; any leftover tmp/old generation is
    *    garbage and is removed.
    *  - live missing, tmp exists (crash between the two renames): the
    *    fold was fully durable BEFORE the demote started (writeTmp
    *    completes first), so promote it and drop the parked old.
    *  - live missing, only old (promote rename failed and rollback
    *    also crashed): roll the old generation back.
    * Idempotent; returns the action taken. */
  def recoverCompaction(spark: SparkSession, livePath: String): String = {
    import org.apache.hadoop.fs.Path
    val live = new Path(livePath)
    val tmp = new Path(livePath + ".compact-tmp")
    val old = new Path(livePath + ".compact-old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(live) && fs.exists(tmp) && fs.exists(old))
      // live + a durable fold + the parked pre-fold pile can only mean
      // the crash happened between the renames AND an ingest tick
      // recreated `live` with post-crash segments before recovery ran.
      // Deleting old/tmp here would destroy the whole pre-crash corpus
      // state; surface it loudly instead — recovery = move live's new
      // seg=N dirs into the promoted generation, then re-run.
      throw new java.io.IOException(
        s"recoverCompaction: $livePath was recreated after a mid-promote " +
          "crash (live, .compact-tmp and .compact-old all exist); merge " +
          "live's new segments into .compact-tmp, delete live, then re-run")
    if (fs.exists(live)) {
      fs.delete(tmp, true); fs.delete(old, true); "live-intact"
    } else if (fs.exists(tmp)) {
      if (!fs.rename(tmp, live))
        throw new java.io.IOException(s"recoverCompaction: promote failed for $tmp")
      fs.delete(old, true); "promoted-tmp"
    } else if (fs.exists(old)) {
      if (!fs.rename(old, live))
        throw new java.io.IOException(s"recoverCompaction: rollback failed for $old")
      "rolled-back"
    } else throw new java.io.IOException(
      s"recoverCompaction: nothing to recover at $livePath")
  }

  /** Partition count for the ExactSubstr fold shuffles: one shuffle
    * partition per ~64 MB of pile bytes, floored at the session
    * parallelism, capped sanely. A CONSTANT partition count is the
    * 100 TB failure mode here — the fold shuffles the whole
    * accumulated O(corpus chars) state, so per-task memory must scale
    * with pile size, not with a config default. Proven by the r14
    * audit run: the 192M-row fold at a fixed 32 partitions OOMed an
    * 8 GiB JVM (≈ 400 MB of hash table per task × 32 concurrent
    * tasks + parquet writer buffers); size-derived partitioning
    * completes in the same JVM. The reference sizes its delta-merge
    * working set the same way — by segment bytes, not a constant
    * (`/root/reference/dbms/src/Storages/DeltaMerge/DeltaMergeStore_InternalBg.cpp`). */
  private def foldPartitions(spark: SparkSession, statePath: String): Int = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    math.min(4096, math.max(spark.sessionState.conf.numShufflePartitions,
      (bytes / (64L << 20)).toInt))
  }

  /** Compact the ExactSubstr window-hash pile: per-segment partial
    * counts fold by addition into ONE (hk, c) generation — the state
    * stops growing with the number of batches and tracks only the
    * distinct-window cardinality. Read results are unchanged (the
    * fold is the same sum `dupHashView` performs). The explicit
    * size-derived repartition on the group keys IS the fold's
    * exchange (the aggregate's required distribution is satisfied, so
    * Catalyst adds no second one). */
  def compactDupSpanState(spark: SparkSession, statePath: String): Unit = {
    requireCheckpointCaughtUp(spark, statePath)
    promoteCompacted(spark, statePath) { tmp =>
      spark.read.parquet(statePath)
        .repartition(foldPartitions(spark, statePath), col("hk"), col("g"))
        .groupBy(col("hk"), col("g"))
        .agg(sum(col("c")).cast("long").as("c"))
        .write.mode("overwrite").parquet(compactedSeg(tmp))
      // one row per distinct window now holds — stamp it so the probe's
      // folded fast path (skip the re-group) can trust the generation
      // (ADVICE r14 #2: mirror the ptr fold's marker discipline)
      stampFolded(spark, compactedSeg(tmp))
    }
  }

  /** Compact the postings segment pile into one folded generation
    * (the Lucene forceMerge analog), preserving the term-hash bucket
    * partitioning a term probe prunes on. The `_buckets` marker is
    * written INTO the temp generation before the promote renames
    * (ADVICE r12 #2): the marker rides every promoted generation
    * atomically, so neither a crash between promote and a post-hoc
    * marker write nor `recoverCompaction`'s promoted-tmp path can
    * strand a marker-less pile. */
  def compactPostings(spark: SparkSession, indexPath: String,
      buckets: Int = 16): Unit = {
    val b = readBucketsMarker(spark, indexPath, buckets)
    requireCheckpointCaughtUp(spark, indexPath)
    promoteCompacted(spark, indexPath) { tmp =>
      mergePostingsSegments(
          spark.read.parquet(indexPath).drop("tbucket", "seg"))
        .withColumn("tbucket", pmod(abs(hash(col("term"))), lit(b)))
        .write.mode("overwrite").partitionBy("tbucket").parquet(compactedSeg(tmp))
      writeBucketsMarker(spark, tmp, b)
    }
  }

  /** Compact the LSH banding pile: banding rows are immutable facts
    * (no fold needed), so compaction rewrites the accumulated
    * small-file segments as one generation per (band, bucket-hash)
    * partition — file-count hygiene for a long-running ingest,
    * read-identical by construction. Both identity markers ride the
    * temp generation through the atomic promote (ADVICE r12 #2). */
  def compactLshIndex(spark: SparkSession, indexPath: String,
      buckets: Int = 16): Unit = {
    val b = readBucketsMarker(spark, indexPath, buckets)
    val (nh, bs) = readBandingMarker(spark, indexPath, (16, 4))
    requireCheckpointCaughtUp(spark, indexPath)
    promoteCompacted(spark, indexPath) { tmp =>
      spark.read.parquet(indexPath).drop("seg")
        .repartition(col("band"), col("bbucket"))
        .write.mode("overwrite").partitionBy("band", "bbucket")
        .parquet(compactedSeg(tmp))
      writeBucketsMarker(spark, tmp, b)
      writeBandingMarker(spark, tmp, nh, bs)
    }
  }

  // ------------------------------------------------------------ queries
  /** MVCC snapshot as a verifiable query (read_ts fixed). */
  val q70MvccSnapshot: QueryDef = QueryDef(
    "q70_mvcc_snapshot",
    """WITH v AS (
      |  SELECT user_id, event_id AS version, (event_type = 'error') AS delmark,
      |         event_type, value
      |  FROM events WHERE event_id <= 8000),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY version DESC) AS rn
      |      FROM v)
      |SELECT user_id, version, event_type, value
      |FROM r WHERE rn = 1 AND NOT delmark""".stripMargin) { (s, d) =>
    snapshot(versioned(Tables.events(s, d)), 8000L)
      .select(col("user_id"), col("version"), col("event_type"), col("value"))
  }

  /** Fast-scan mode ≙ raw read skipping MVCC resolution
    * (`Storages/DeltaMerge/ReadMode.h:20-32`): all versions, with a
    * tombstone count per pk. */
  val q71FastScan: QueryDef = QueryDef(
    "q71_fast_scan",
    """SELECT user_id, COUNT(*) AS n_versions,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_tombstones,
      |  MAX(event_id) AS max_version
      |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_versions"),
        count(when(col("event_type") === "error", 1)).as("n_tombstones"),
        max(col("event_id")).as("max_version"))
  }

  /** Event-time tumbling-window aggregation — the batch equivalent of
    * the streaming windowed agg (same `window()` operator Structured
    * Streaming uses with a watermark). */
  val q72EventWindowAgg: QueryDef = QueryDef(
    "q72_event_window_agg",
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
          .cast("double").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
  }

  /** Sessionization over the changelog: gap > 30 min starts a new
    * session per user (window lag + running sum — the batch analog of
    * stateful mapGroupsWithState sessionization). */
  val q73Sessionize: QueryDef = QueryDef(
    "q73_sessionize",
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
      |      lag(epoch_us(CAST(ts AS TIMESTAMP)), 1, epoch_us(CAST(ts AS TIMESTAMP)))
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |s AS (SELECT user_id, event_id,
      |        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |      FROM g)
      |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
      |  COUNT(*) AS n_events, MIN(event_id) AS first_event
      |FROM s GROUP BY user_id, sess_id""".stripMargin) { (s, d) =>
    // Integer microseconds end-to-end: DuckDB's epoch() returns a double
    // whose ~0.5 µs resolution at 1.7e9 s can flip a boundary gap test;
    // unix_micros here vs epoch_us in the oracle are both exact BIGINTs.
    val ep = unix_micros(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val g = Tables.events(s, d)
      .withColumn("new_sess",
        when(ep - lag(ep, 1).over(w) > 1800L * 1000000L, 1).otherwise(0))
    g.withColumn("sess_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
  }.copy(headline = true)

  /** Custom stateful sessionization via `flatMapGroupsWithState` — the
    * KeyValueGroupedDataset custom-state surface (SURVEY §2.6). Same
    * gap semantics as q73's window-lag batch form (new session when the
    * gap exceeds 30 min), but with EXPLICIT per-key state carried
    * across micro-batches: state = (current session id, last event
    * µs), events within a batch processed in (ts, event_id) order.
    * Works identically on a batch Dataset (Spark runs the function per
    * group with empty initial state), which is what makes it testable
    * against the window-lag analog. */
  def sessionizeStateful(df: DataFrame)(implicit s: SparkSession): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    df.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        val evs = it.toArray.sortBy(e => (e._3, e._2))
        var (sessId, lastTs) = state.getOption.getOrElse((0L, Long.MinValue))
        val out = evs.map { case (_, eid, ts) =>
          if (lastTs != Long.MinValue && ts - lastTs > 1800L * 1000000L) sessId += 1
          lastTs = ts
          (uid, eid, sessId)
        }
        state.update((sessId, lastTs))
        out.iterator
      }
      .toDF("user_id", "event_id", "sess_id")
  }

  /** Spark 4's arbitrary-state API (`transformWithState`, the successor
    * to flatMapGroupsWithState): the same gap-sessionization semantics
    * as [[sessionizeStateful]], but with NAMED typed state
    * (`ValueState`) acquired from the `StatefulProcessorHandle` — the
    * API that supports multiple state variables, TTL, and timers, and
    * runs on the RocksDB state store in streaming mode. State is
    * (current session id, last event µs) per user. */
  class SessionizeProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("sess",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long, Long)],
        tv: TimerValues): Iterator[(Long, Long, Long)] = {
      val evs = rows.toArray.sortBy(e => (e._3, e._2))
      var (sessId, lastTs) = if (st.exists()) st.get() else (0L, Long.MinValue)
      val out = evs.map { case (_, eid, ts) =>
        if (lastTs != Long.MinValue && ts - lastTs > 1800L * 1000000L) sessId += 1
        lastTs = ts
        (uid, eid, sessId)
      }
      st.update((sessId, lastTs))
      out.iterator
    }
  }

  def sessionizeTws(df: DataFrame)(implicit s: SparkSession): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    df.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionizeProcessor, TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "event_id", "sess_id")
  }

  /** Native session windows (`session_window`, the engine's stateful
    * sessionization operator — works identically in batch and
    * Structured Streaming with a watermark; `StreamingSpec` runs the
    * streaming side). Gap semantics: events merge iff the gap is
    * STRICTLY less than 30 min (session_window's [start, last+gap)
    * interval), which the oracle spells as `>= 1800s starts new`. */
  def sessionAgg(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    df.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("n_events"), col("first_event"))

  val q74SessionWindow: QueryDef = QueryDef(
    "q74_session_window",
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
      |      lag(epoch_us(CAST(ts AS TIMESTAMP)), 1, epoch_us(CAST(ts AS TIMESTAMP)))
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
      |      THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |s AS (SELECT user_id, event_id, ts,
      |        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |      FROM g)
      |SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS sess_start,
      |  COUNT(*) AS n_events, MIN(event_id) AS first_event
      |FROM s GROUP BY user_id, sess_id""".stripMargin) { (s, d) =>
    sessionAgg(Tables.events(s, d))
  }

  /** Snapshot DIFF between two read timestamps — the CDC view an HTAP
    * replica answers ("what changed between my last read and now"):
    * per pk, classify added / deleted / updated / unchanged from the
    * newest surviving version at each ts. Both snapshots shuffle on the
    * same pk, so the full-outer join is co-partitioned — one exchange
    * per side serves the window AND the join; high-cardinality pk keeps
    * every stage scalable. */
  val q141MvccDiff: QueryDef = QueryDef(
    "q141_mvcc_diff",
    """WITH v AS (
      |  SELECT user_id, event_id AS version, (event_type = 'error') AS delmark
      |  FROM events),
      |s1 AS (SELECT user_id, version FROM (
      |    SELECT user_id, version, delmark,
      |      row_number() OVER (PARTITION BY user_id ORDER BY version DESC) AS rn
      |    FROM v WHERE version <= 5000) WHERE rn = 1 AND NOT delmark),
      |s2 AS (SELECT user_id, version FROM (
      |    SELECT user_id, version, delmark,
      |      row_number() OVER (PARTITION BY user_id ORDER BY version DESC) AS rn
      |    FROM v WHERE version <= 8000) WHERE rn = 1 AND NOT delmark)
      |SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
      |  s1.version AS v1, s2.version AS v2,
      |  CASE WHEN s1.user_id IS NULL THEN 'added'
      |       WHEN s2.user_id IS NULL THEN 'deleted'
      |       WHEN s1.version = s2.version THEN 'unchanged'
      |       ELSE 'updated' END AS change
      |FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id""".stripMargin) {
    (s, d) =>
    val v = versioned(Tables.events(s, d))
    val a = snapshot(v, 5000L).select(col("user_id"), col("version").as("v1"))
    val b = snapshot(v, 8000L).select(col("user_id"), col("version").as("v2"))
    a.join(b, Seq("user_id"), "full_outer")
      .select(col("user_id"), col("v1"), col("v2"),
        when(col("v1").isNull, "added")
          .when(col("v2").isNull, "deleted")
          .when(col("v1") === col("v2"), "unchanged")
          .otherwise("updated").as("change"))
  }

  val all: Seq[QueryDef] = Seq(
    q70MvccSnapshot, q71FastScan, q72EventWindowAgg, q73Sessionize,
    q74SessionWindow, q141MvccDiff)
}
