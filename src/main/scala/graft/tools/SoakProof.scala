package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale run of the crash-injected incremental-lifecycle soak (r14
  * VERDICT ask #4): the same choreography `graft.SoakSpec` proves at
  * test scale — 12 maintenance ticks, here across all TEN segment
  * piles (agg MV, postings, LSH banding, ExactSubstr window state in
  * BOTH text and pointer forms, shingle sets, the IVF vector
  * index — the 7th surface, r16 VERDICT ask #2 — and, late r17, the
  * tf-postings + doc-stats pair behind the q267 BM25 probe plus the
  * positional pile behind q269's phrase probe), seeded
  * crash injection between ticks (stale fold tmp, mid-promote kill,
  * lost checkpoint commit, torn marker), and the compaction policy
  * LIVE (threshold 4, so every pile folds ~3× from ingest alone) —
  * driven at an arbitrary SF with timing and DISTRIBUTED equivalence
  * checks instead of collect-based set compares (a 10× postings view
  * does not fit a driver). The reference's delta-merge endurance
  * evidence is fullstack-scale
  * (`/root/reference/dbms/src/Storages/DeltaMerge/DeltaMergeStore_InternalBg.cpp:572-637`);
  * this is the equivalent run for this engine's piles.
  *
  * Equivalence = (row count, order-independent checksum): each view is
  * reduced to `(count, sum(xxhash64(cols)))` entirely on executors —
  * two longs cross the driver, never the view. Identical (count,
  * checksum) pairs between the maintained pile's read view and a
  * from-scratch rebuild over the ingested prefix is the same
  * "view ≡ rebuild" contract SoakSpec asserts by set equality.
  *
  * Output: one JSON line per (tick, pile) with wall seconds (ingest +
  * any policy-triggered fold inside it — the production tick cost), a
  * line per injected crash, equivalence lines at ticks 3/7/11, and a
  * final summary line with the probe-vs-batch-q215 check.
  *
  * Usage: runMain graft.tools.SoakProof <sfDir> <workDir> [ticks]
  */
object SoakProof {
  private val Threshold = 4

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val work = args.drop(1).headOption.getOrElse("/tmp/soakproof")
    val ticks = args.drop(2).headOption.map(_.toInt).getOrElse(12)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.Ingest
    import graft.operators.{InvertedText, TextPipeline}

    val fs = new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(work), true)
    val inDocs = s"$work/in-docs"
    val inEv = s"$work/in-ev"
    val inEmb = s"$work/in-emb"
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val events = graft.sources.Tables.events(spark, sfDir)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    // the IVF quantizer is FIXED for the pile's lifetime (trained
    // upfront — the standard IVF ingest contract, q58's deterministic
    // hash sample); per-tick ingest only assigns new vectors to it
    val cent = graft.operators.Similarity.ivfCentroids(emb)
    def docPrefix(t: Int) = docs.filter(pmod(col("doc_id"), lit(ticks)) <= t)
    def evPrefix(t: Int) = events.filter(pmod(col("event_id"), lit(ticks)) <= t)
    def embPrefix(t: Int) = emb.filter(pmod(col("vec_id"), lit(ticks)) <= t)

    /** (rows, order-independent checksum) — computed on executors;
      * array/struct columns hash via their string form so both sides
      * canonicalize identically. The per-row hashes sum as
      * DECIMAL(38,0): a plain BIGINT sum of 64-bit hashes overflows
      * (ANSI mode raises), and 38 digits hold ~1e19 × any realistic
      * row count exactly. */
    def sig(df: DataFrame): (Long, String) = {
      val hashed = df.select(xxhash64(df.columns.map(c =>
        col(c).cast("string")): _*).cast("decimal(38,0)").as("h"))
      val r = hashed.agg(count(lit(1)), sum(col("h"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toBigInteger.toString)
    }

    case class Pile(name: String, path: String, ingest: () => Unit,
        compact: () => Unit, view: () => (Long, String),
        fromScratch: Int => (Long, String))

    // The agg MV's exact columns (keys, cnt, vsum) checksum exactly;
    // the HLL DISTINCT state is checked separately at the end with an
    // error-bound tolerance — a 10×-surfaced property worth naming:
    // union-of-partials and a one-shot sketch are register-equivalent,
    // but DataSketches estimates a directly-built sketch through its
    // HIP accumulator and a unioned sketch through the composite
    // estimator, so exact estimate equality holds only in list/set
    // (exact) mode — the regime the test-scale SoakSpec runs in. At
    // 10× the dense-mode groups diverge within the sketch's RSE.
    val agg = Pile("agg", s"$work/agg",
      () => Ingest.streamAggMaintain(spark, inEv, s"$work/agg",
        autoCompactSegments = Threshold),
      () => Ingest.compactAggState(spark, s"$work/agg"),
      () => sig(Ingest.aggViewOf(spark.read.parquet(s"$work/agg"))
        .select(col("event_type"), col("day"), col("cnt"),
          col("vsum").cast("decimal(30,2)"))),
      t => sig(Ingest.aggPartial(evPrefix(t))
        .select(col("event_type"), col("day"), col("cnt"),
          col("vsum").cast("decimal(30,2)"))))
    val post = Pile("postings", s"$work/post",
      () => Ingest.streamPostingsIngest(spark, inDocs, s"$work/post",
        autoCompactSegments = Threshold),
      () => Ingest.compactPostings(spark, s"$work/post"),
      () => sig(Ingest.mergePostingsSegments(
        spark.read.parquet(s"$work/post").drop("tbucket", "seg"))),
      t => sig(InvertedText.buildPostings(docPrefix(t))))
    val lsh = Pile("lsh", s"$work/lsh",
      () => Ingest.streamLshIngest(spark, inDocs, s"$work/lsh",
        autoCompactSegments = Threshold),
      () => Ingest.compactLshIndex(spark, s"$work/lsh"),
      () => sig(TextPipeline.lshPairsFromBands(
        spark.read.parquet(s"$work/lsh")
          .select(col("doc_id"), col("band"), col("bucket")))),
      t => sig(TextPipeline.lshPairsFromBands(
        TextPipeline.minhashBands(docPrefix(t)))))
    val span = Pile("span", s"$work/span",
      () => Ingest.streamDupSpanMaintain(spark, inDocs, s"$work/span",
        autoCompactSegments = Threshold),
      () => Ingest.compactDupSpanState(spark, s"$work/span"),
      () => sig(Ingest.dupHashView(spark.read.parquet(s"$work/span"))),
      t => sig(TextPipeline.dupSpanPartial(docPrefix(t))
        .filter(col("c") >= 2).select(col("hk"), col("g"))))
    // The POINTER-state span pile (the 5th surface): per-checkpoint
    // integrity view = per-hash total counts — both sides pool 64-bit
    // collisions identically, so multiset equality pins the stored
    // state; collision-exact SEMANTICS are covered by the probe ≡
    // batch-q215 end check and StreamingSpec's planted contracts.
    // Injection/auto-compaction use the rewrite compactor (the fold is
    // a corpus-pass background job exercised by IncrementalProof).
    val spanPtr = Pile("span-ptr", s"$work/span-ptr",
      () => Ingest.streamDupSpanMaintainPtr(spark, inDocs, s"$work/span-ptr",
        autoCompactSegments = Threshold),
      () => Ingest.compactDupSpanStatePtr(spark, s"$work/span-ptr"),
      () => sig(spark.read.parquet(s"$work/span-ptr")
        .groupBy(col("hk")).agg(sum(col("c")).cast("long").as("c"))),
      t => sig(TextPipeline.dupSpanPartialPtr(docPrefix(t))
        .groupBy(col("hk")).agg(sum(col("c")).cast("long").as("c"))))
    // The shingle pile (the 6th surface): rows are immutable per-doc
    // facts, so the view is the rows themselves.
    val shingle = Pile("shingle", s"$work/shingle",
      () => Ingest.streamShingleIngest(spark, inDocs, s"$work/shingle",
        autoCompactSegments = Threshold),
      () => Ingest.compactShinglePile(spark, s"$work/shingle"),
      () => sig(spark.read.parquet(s"$work/shingle")
        .select(col("doc_id"), col("sh"))),
      t => sig(docPrefix(t).filter(size(TextPipeline.tokens) >= 3)
        .select(col("doc_id"),
          array_distinct(TextPipeline.shingles(TextPipeline.tokens, 3)).as("sh"))))
    // The IVF pile (the 7th surface, r16 VERDICT ask #2): assignment
    // rows are immutable per-vector facts against the fixed quantizer,
    // so the view is the rows themselves (cid partition values read
    // back as ints — cast to the assignment's long for the checksum).
    val ivf = Pile("ivf", s"$work/ivf",
      () => Ingest.streamIvfIngest(spark, inEmb, s"$work/ivf", cent,
        autoCompactSegments = Threshold),
      () => Ingest.compactIvfIndex(spark, s"$work/ivf"),
      () => sig(spark.read.parquet(s"$work/ivf")
        .select(col("vec_id"), col("cid").cast("long").as("cid"))),
      t => sig(graft.operators.Similarity.ivfAssign(embPrefix(t), cent)
        .select(col("vec_id"), col("cid"))))
    // The tf-postings pile (the 8th surface, late r17 — the ranked-
    // retrieval index behind q267): rows are immutable per-(doc, term)
    // facts with the denormalized doc length, so the view is the rows
    // themselves.
    val tfPost = Pile("tf-postings", s"$work/tfpost",
      () => Ingest.streamTfPostingsIngest(spark, inDocs, s"$work/tfpost",
        autoCompactSegments = Threshold),
      () => Ingest.compactTfPostings(spark, s"$work/tfpost"),
      () => sig(spark.read.parquet(s"$work/tfpost")
        .select(col("term"), col("doc_id"), col("tf"), col("dl"))),
      t => sig(InvertedText.buildTfPostings(docPrefix(t))))
    // The doc-stats pile (the 9th surface): keyless mergeable sums —
    // BM25's (N, Σdl) corpus constants; the fold view is one row.
    val stats = Pile("doc-stats", s"$work/docstats",
      () => Ingest.streamDocStatsIngest(spark, inDocs, s"$work/docstats",
        autoCompactSegments = Threshold),
      () => Ingest.compactDocStats(spark, s"$work/docstats"),
      () => sig(Ingest.docStatsView(spark.read.parquet(s"$work/docstats"))),
      t => sig(Ingest.docStatsPartial(docPrefix(t))))
    // The positional-postings pile (the 10th surface — q269's phrase
    // index): flat occurrence rows are immutable per-token facts.
    val posPost = Pile("pos-postings", s"$work/pospost",
      () => Ingest.streamPosPostingsIngest(spark, inDocs, s"$work/pospost",
        autoCompactSegments = Threshold),
      () => Ingest.compactPosPostings(spark, s"$work/pospost"),
      () => sig(spark.read.parquet(s"$work/pospost")
        .select(col("term"), col("doc_id"), col("pos"))),
      t => sig(docPrefix(t).select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "term")))
        .select(col("term"), col("doc_id"), col("pos"))))
    val piles = Seq(agg, post, lsh, span, spanPtr, shingle, ivf, tfPost,
      stats, posPost)

    def segDirs(p: String): Set[String] = {
      val d = new Path(p)
      if (!fs.exists(d)) Set.empty
      else fs.listStatus(d).map(_.getPath.getName).filter(_.startsWith("seg=")).toSet
    }

    /** Retention invariant at soak scale (r15 VERDICT ask #6; test-
      * scale form at `StreamingSpec` "compaction retains only the
      * promoted generation"): after every tick — and in the STRONG
      * form right after a policy fold, when only seg=-1 may remain —
      * a pile root holds nothing but seg=* generations and underscore
      * markers, and no `.compact-tmp`/`.compact-old` sibling survives.
      * A multi-fold history is exactly where a stranded old
      * generation, staging dir, or tmp sibling would accumulate. */
    def assertRetention(p: Pile, tick: Int, justFolded: Boolean): Unit = {
      for (suffix <- Seq(".compact-tmp", ".compact-old")) {
        val sib = new Path(p.path + suffix)
        require(!fs.exists(sib),
          s"[${p.name} tick $tick] stranded compaction sibling: $sib")
      }
      val children = fs.listStatus(new Path(p.path)).map(_.getPath.getName)
      val stray = children.filterNot(n => n.startsWith("seg=") || n.startsWith("_"))
      require(stray.isEmpty,
        s"[${p.name} tick $tick] non-generation content in pile root: ${stray.mkString(", ")}")
      if (justFolded) {
        val gens = children.filter(_.startsWith("seg=")).toSet
        require(gens == Set("seg=-1"),
          s"[${p.name} tick $tick] post-fold root must hold ONLY the " +
            s"promoted seg=-1 generation, got ${gens.mkString(", ")}")
      }
    }

    // Seeded schedule: every crash class fires at least twice across
    // the 11 injection slots, in random order, on a random pile — the
    // SoakSpec discipline at scale.
    val rng = new scala.util.Random(20260816L)
    val schedule = rng.shuffle((0 until ticks - 1).map(_ % 5).toList)
    val injected = scala.collection.mutable.Set[String]()

    def inject(tick: Int): Unit = {
      val pick = rng.nextInt(piles.size)
      val p = piles(pick)
      schedule(tick - 1) match {
        case 0 => // no crash this tick
        case 1 =>
          injected += "stale-tmp"
          fs.mkdirs(new Path(p.path + ".compact-tmp/seg=-1"))
          val o = fs.create(new Path(p.path + ".compact-tmp/seg=-1/garbage"), true)
          o.write("stale".getBytes("UTF-8")); o.close()
          val act = Ingest.recoverCompaction(spark, p.path)
          require(act == "live-intact", s"stale-tmp recovery: $act")
          println(s"""{"tick":$tick,"crash":"stale-tmp","pile":"${p.name}","recovered":"$act"}""")
        case 2 =>
          injected += "mid-promote"
          val want = p.view()
          p.compact()
          require(fs.rename(new Path(p.path), new Path(p.path + ".compact-tmp")))
          val act = Ingest.recoverCompaction(spark, p.path)
          require(act == "promoted-tmp", s"mid-promote recovery: $act")
          val got = p.view()
          require(got == want, s"mid-promote view drift: $want -> $got")
          println(s"""{"tick":$tick,"crash":"mid-promote","pile":"${p.name}","recovered":"$act","viewPreserved":true}""")
        case 3 =>
          // rotate from the random pick to the first ELIGIBLE pile
          // (un-folded segments + a commit log) so the class fires
          // whenever any pile is eligible — the fixed-seed schedule
          // stays class-complete as piles are added (the SoakSpec fix)
          piles.indices.map(j => piles((pick + j) % piles.size))
            .find(c => segDirs(c.path).exists(_ != "seg=-1") &&
              fs.exists(new Path(c.path + "-ckpt/commits")))
            .foreach { c =>
              val commits = new Path(c.path + "-ckpt/commits")
              injected += "lost-commit"
              val last = fs.listStatus(commits).map(_.getPath.getName)
                .filter(_.forall(_.isDigit)).map(_.toLong).max
              require(fs.delete(new Path(s"$commits/$last"), false))
              val refused =
                try { c.compact(); false }
                catch { case e: java.io.IOException =>
                  e.getMessage.contains("not yet committed") }
              require(refused, "lost-commit: compaction must refuse in the replay window")
              c.ingest() // idempotent replay heals the commit log
              println(s"""{"tick":$tick,"crash":"lost-commit","pile":"${c.name}","refused":true}""")
            }
        case 4 =>
          val marker = new Path(lsh.path + "/_buckets")
          if (fs.exists(marker)) {
            injected += "torn-marker"
            fs.create(marker, true).close()
            val refused =
              try { lsh.ingest(); false }
              catch { case e: java.io.IOException =>
                e.getMessage.contains("corrupt _buckets marker") }
            require(refused, "torn-marker: ingest must refuse a 0-byte marker")
            val o2 = fs.create(marker, true)
            o2.write("16".getBytes("UTF-8")); o2.close()
            println(s"""{"tick":$tick,"crash":"torn-marker","pile":"lsh","refused":true}""")
          }
      }
    }

    for (tick <- 0 until ticks) {
      docs.filter(pmod(col("doc_id"), lit(ticks)) === tick)
        .write.mode("append").parquet(inDocs)
      events.filter(pmod(col("event_id"), lit(ticks)) === tick)
        .write.mode("append").parquet(inEv)
      emb.filter(pmod(col("vec_id"), lit(ticks)) === tick)
        .write.mode("append").parquet(inEmb)
      if (tick > 0) inject(tick)
      for (p <- piles) {
        val liveBefore = segDirs(p.path).count(_ != "seg=-1")
        val t0 = System.nanoTime()
        p.ingest()
        val sec = (System.nanoTime() - t0) / 1e9
        val live = segDirs(p.path).count(_ != "seg=-1")
        require(live < Threshold,
          s"[${p.name} tick $tick] policy failed to bound the pile: $live live segments")
        // fewer live segments after an ingest ⇒ the policy folded
        // inside this tick ⇒ the strong only-seg=-1 retention form
        val folded = live < liveBefore
        assertRetention(p, tick, folded)
        println(f"""{"tick":$tick,"pile":"${p.name}","tickSec":$sec%.2f,""" +
          s""""liveSegments":$live,"foldedThisTick":$folded,"retentionClean":true}""")
      }
      if (tick % 4 == 3 || tick == ticks - 1)
        for (p <- piles) {
          val v = p.view(); val r = p.fromScratch(tick)
          require(v == r && v._1 > 0,
            s"[${p.name} tick $tick] view $v diverged from rebuild $r")
          println(s"""{"tick":$tick,"pile":"${p.name}","rows":${v._1},"checksumMatch":true}""")
        }
    }
    require(injected == Set("stale-tmp", "mid-promote", "lost-commit", "torn-marker"),
      s"seed must exercise every crash class, got $injected")

    // HLL distinct-state equivalence (see the agg pile note): per-group
    // estimates of the folded pile vs a one-shot rebuild must agree
    // within max(1, 2%) — lgK=12 has ~1.6% RSE, and the two sides
    // estimate register-equivalent state through different estimators
    // (HIP vs composite) once groups leave exact mode.
    val estV = Ingest.aggViewOf(spark.read.parquet(s"$work/agg"))
      .select(col("event_type"), col("day"),
        hll_sketch_estimate(col("users_hll")).cast("double").as("e1"))
    val estR = Ingest.aggPartial(evPrefix(ticks - 1))
      .select(col("event_type"), col("day"),
        hll_sketch_estimate(col("users_hll")).cast("double").as("e2"))
    val estBad = estV.join(estR, Seq("event_type", "day"), "full_outer")
      .filter(col("e1").isNull || col("e2").isNull ||
        abs(col("e1") - col("e2")) > greatest(lit(1.0), col("e2") * 0.02))
      .count()
    println(s"""{"hllEstimateWithin2pct":${estBad == 0},"badGroups":$estBad}""")
    require(estBad == 0, s"$estBad HLL group estimates beyond 2% of rebuild")

    // probe-level equivalence on the fully-ingested corpus: dup-span
    // probe of the final slice ≡ batch q215 rows for those docs
    val slice = docs.filter(pmod(col("doc_id"), lit(ticks)) === ticks - 1)
    val probed = sig(Ingest.dupSpanProbe(spark, span.path, slice))
    graft.CacheHygiene.sweep(spark, "soak-probe")
    val direct = sig(TextPipeline.q215DupSpans.fn(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(ticks)) === ticks - 1))
    graft.CacheHygiene.sweep(spark, "q215_dup_spans")
    println(s"""{"summary":true,"sfDir":"$sfDir","ticks":$ticks,""" +
      s""""crashClasses":${injected.size},"probeRows":${probed._1},""" +
      s""""batchRows":${direct._1},"probeEqualsBatch":${probed == direct}}""")
    require(probed == direct, "post-soak dup-span probe diverged from batch q215")

    // IVF probe ≡ batch on the fully-ingested corpus: the pile probe's
    // top-k must equal ivfSearch's inline answer with the same
    // quantizer — the q262 contract at soak scale, after 12 ticks of
    // crash-injected maintenance
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val ivfProbed = sig(Ingest.ivfProbe(spark, s"$work/ivf", q, nProbe = 4))
    val ivfBatch = sig(graft.operators.Similarity.ivfSearch(emb, nProbe = 4,
      centroids = Some(cent)))
    println(s"""{"ivfProbeRows":${ivfProbed._1},"ivfBatchRows":${ivfBatch._1},""" +
      s""""ivfProbeEqualsBatch":${ivfProbed == ivfBatch}}""")
    require(ivfProbed == ivfBatch, "post-soak IVF probe diverged from batch ivfSearch")

    // BM25 probe ≡ batch on the fully-ingested corpus: the pile-served
    // ranking (tf-postings + doc-stats) must equal q75b's from-scratch
    // answer, scores included — the q267 contract at soak scale
    val bmProbed = sig(Ingest.bm25Probe(spark, tfPost.path, stats.path,
      Seq("hash", "join", "scan")))
    val bmBatch = sig(InvertedText.q75bBm25.fn(spark, sfDir))
    println(s"""{"bm25ProbeRows":${bmProbed._1},"bm25BatchRows":${bmBatch._1},""" +
      s""""bm25ProbeEqualsBatch":${bmProbed == bmBatch}}""")
    require(bmProbed == bmBatch, "post-soak BM25 probe diverged from batch q75b")

    // phrase probe ≡ batch q142 — the q269 contract at soak scale
    val phProbed = sig(Ingest.phraseProbe(spark, posPost.path, "hash", "join"))
    val phBatch = sig(InvertedText.q142PhraseSearch.fn(spark, sfDir))
    println(s"""{"phraseProbeRows":${phProbed._1},"phraseBatchRows":${phBatch._1},""" +
      s""""phraseProbeEqualsBatch":${phProbed == phBatch}}""")
    require(phProbed == phBatch, "post-soak phrase probe diverged from batch q142")
    spark.stop()
  }
}
