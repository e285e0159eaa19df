package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape assertions ≙ the reference's interpreter golden tests
  * (`/root/reference/dbms/src/Flash/tests/gtest_planner_interpreter.cpp`):
  * the physical plan, not just the result, must be the one a 100 TB
  * deployment needs — filters pushed to the parquet scan, small dims
  * broadcast, top-k as TakeOrderedAndProject. */
class PlanShapeSpec extends SparkTestBase {

  private def planString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    finalPlanOf(df)
  }

  /** AQE-final plan text of an ALREADY-MATERIALIZED DataFrame (the
    * caller must have run an action first, so tests that also assert
    * on rows execute the query exactly once). */
  private def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    val finalPlan: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.toString
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = planString("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter:\n$p")
  }

  test("q1_agg does partial then final aggregation") {
    val p = planString("q1_agg")
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).length >= 2, "expected partial+final agg")
  }

  test("q5_join_inner broadcasts the dimension side") {
    val p = planString("q5_join_inner")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q3_topn plans TakeOrderedAndProject (no global sort)") {
    val p = planString("q3_topn")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q2_filter_project prunes columns at the scan") {
    val p = planString("q2_filter_project")
    assert(p.contains("ReadSchema"), p)
    // only the 7 needed columns of 11 should be read
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_shipdate") && !read.contains("l_partkey"),
      s"scan reads pruned columns: $read")
  }

  test("q51 KNN broadcasts the query vectors (no shuffle of the big side)") {
    val p = planString("q51_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected broadcast for query set:\n$p")
  }

  test("q51c filtered ANN pushes the scalar predicate to the scan (pre-filter)") {
    // hybrid search: the label predicate must prune at the parquet
    // reader BEFORE distance evaluation (≙ the reference pushing
    // filters into the vector index scan) — post-filtering a top-k
    // would return fewer than k rows. One execution serves both the
    // AQE-final plan and the row-count assertion.
    val df = SparkEntry.queries("q51c_knn_filtered")(spark, sf)
    val rows = df.collect()
    val p = finalPlanOf(df)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(label,3)"),
      s"label pre-filter not pushed to the scan:\n$p")
    assert(rows.length == 5 * 10, "pre-filter must still yield k results per query")
  }

  test("q110 TPC-H Q3 ranks its top-10 as TakeOrderedAndProject (no global sort)") {
    val p = planString("q110_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q111 TPC-H Q6 pushes all three scan predicates to the parquet reader") {
    // the no-join scan query exists to prove pushdown: date range,
    // discount band, and quantity cap must all reach the reader. The
    // plan's toString truncates the PushedFilters list, so read the
    // scan node's metadata directly.
    val df = SparkEntry.queries("q111_tpch_q6")(spark, sf)
    // pushdown is decided at planning; the pre-AQE physical plan has
    // the scan node directly (AQE wraps it in opaque query stages)
    val pushed = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), s"date bound not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      pushed.contains("LessThanOrEqual(l_discount,0.07)"), s"discount band not pushed: $pushed")
    assert(pushed.contains("LessThan(l_quantity,24"), s"quantity cap not pushed: $pushed")
  }

  test("no window query runs an unpartitioned window over raw (unaggregated) data") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // every Window with an empty partitionSpec must sit above an
    // Aggregate — i.e. over data bounded by a grouping (e.g. the
    // per-range-partition offsets in ScalableSort, #partitions rows),
    // never over a raw table, which would serialize the whole input
    // into one task at scale
    for (name <- Seq("q26_sort_full", "q45_window_distribution",
        "q40_window_rank", "q43_window_rows_frame")) {
      val lp = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.foreach { w =>
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"$name: unpartitioned Window over non-aggregated input:\n$lp")
      }
    }
  }

  test("pipeline operators are shuffle-minimal (embedding: 1, minhash: ≤3)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE off so the static plan exposes raw exchange counts
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def shuffles(name: String): Int =
        SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
          .collect { case s: ShuffleExchangeExec => s }.size
      // embedding: single groupBy on doc_id
      assert(shuffles("q77_hash_embedding") <= 1)
      // minhash: shingle window (doc) shared with the signature groupBy,
      // then (band,bucket) groupBy, then pair distinct
      assert(shuffles("q61_dedup_minhash") <= 3)
      // bounded-bucket pair expansion: ONE groupBy on the content block
      // key, no pair join — cap² output per bucket regardless of corpus
      assert(shuffles("q63_ngram_jaccard") <= 1)
      assert(shuffles("q69_edit_distance") <= 1)
      // embed near-dup now rides the same bounded-bucket shape: one
      // groupBy on (label, sign-bits), pair output ≤ cap²/2 per bucket
      assert(shuffles("q54_embed_neardup") <= 1)
      // PQ/ADC: encode groupBy + ADC groupBy + rank window; codebook and
      // lookup tables broadcast, raw vectors never reshuffled
      assert(shuffles("q56_ann_pq") <= 3)
      // sequence packing: ONE shard exchange serves both the running-sum
      // window and the per-shard aggregate (same key — no re-shuffle)
      assert(shuffles("q138_sequence_pack") <= 1)
      // chunking: pure per-row explode — NO shuffle at all
      assert(shuffles("q146_chunking") === 0)
      // dedup representative: one hash exchange serves rank + group agg
      assert(shuffles("q147_dedup_representative") <= 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q156 HLL rollup scans lineitem exactly once (sketch union, no rescan)") {
    // the global estimate comes from unioning the per-group sketches
    // over the ≤ #groups aggregated rows — a second fact scan in the
    // plan would mean the rollup recomputed from raw data
    val plan = planString("q156_hll_sketch")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected a single lineitem scan, got $scans:\n$plan")
  }

  test("q139 n-gram decontamination broadcasts the bench grams (no corpus-gram shuffle join)") {
    val df = SparkEntry.queries("q139_ngram_decontaminate")(spark, sf)
    df.collect()
    val p = finalPlanOf(df)
    assert(p.contains("BroadcastHashJoin"), s"bench side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus grams must never shuffle for the join:\n$p")
  }

  test("q54 embed near-dup has no pair join — pairs expand from capped buckets") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val lp = SparkEntry.queries("q54_embed_neardup")(spark, sf).queryExecution.optimizedPlan
    assert(lp.collect { case j: Join => j }.isEmpty,
      s"expected zero joins (bounded bucket expansion), got:\n$lp")
  }

  test("q85 fixed-count exchange consumes the phase-0 rank, not the raw scan") {
    import org.apache.spark.sql.catalyst.plans.logical.{
      MapPartitions, RepartitionOperation, Window => LWindow}
    val lp = SparkEntry.queries("q85_stratified_sample")(spark, sf).queryExecution.optimizedPlan
    // phase 1 (the spark_partition_id local re-rank) must sit above a
    // fixed-count repartition, so the final per-class window input is
    // ≤ quota × fixedParts rows no matter how many input splits the
    // scan produces
    val innermostWindow = lp.collect { case w: LWindow => w }.last
    val fixedRepart = innermostWindow.child.collectFirst {
      case r: RepartitionOperation if r.numPartitions == 32 => r
    }
    assert(fixedRepart.nonEmpty,
      s"local re-rank must follow a fixed-count repartition:\n$lp")
    // ...and that repartition must consume the phase-0 per-scan-partition
    // rank (the bounded-heap mapPartitions), NOT the full projected
    // corpus — otherwise the fixed count is a full-width funnel at scale
    assert(fixedRepart.get.child.collectFirst { case m: MapPartitions => m }.nonEmpty,
      s"fixed-count exchange must sit above the phase-0 local rank:\n$lp")
    // phase 0 itself runs on the natural scan partitions: nothing below
    // the mapPartitions may repartition
    val phase0 = fixedRepart.get.child.collectFirst { case m: MapPartitions => m }.get
    assert(phase0.child.collect { case r: RepartitionOperation => r }.isEmpty,
      s"phase-0 rank must run over natural scan partitions (no prior exchange):\n$lp")
  }

  test("q104 decorrelates EXISTS/NOT EXISTS into semi/anti joins, no cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.{Cross, LeftAnti, LeftSemi}
    val lp = SparkEntry.queries("q104_tpch_q21")(spark, sf).queryExecution.optimizedPlan
    val joins = lp.collect { case j: Join => j }
    assert(joins.exists(_.joinType == LeftSemi), s"expected LeftSemi (EXISTS):\n$lp")
    assert(joins.exists(_.joinType == LeftAnti), s"expected LeftAnti (NOT EXISTS):\n$lp")
    // every join must carry a condition — the suppkey inequality is a
    // residual on the orderkey equi-join, never a cross product
    assert(joins.forall(j => j.condition.nonEmpty && j.joinType != Cross),
      s"found an unconditioned/cross join:\n$lp")
  }

  test("q106 disjunctive mixed-table predicate keeps the equi-join (no nested loop)") {
    val p = planString("q106_tpch_q19")
    // the OR-of-ANDs mixes part and lineitem columns; the optimizer must
    // still join on the extracted p_partkey = l_partkey equi-key and
    // evaluate the disjunction as a post-join filter — degrading to a
    // nested-loop/cartesian would be O(|lineitem|·|part|) at scale
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q106 degraded to a non-equi join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected an equi join:\n$p")
  }

  test("q105 collated rank orders differently from binary rank") {
    val rows = SparkEntry.queries("q105_collate_orderby")(spark, sf).collect()
    val ciOrder = rows.sortBy(_.getLong(2)).map(_.getString(0)).toSeq
    val binOrder = rows.sortBy(_.getLong(3)).map(_.getString(0)).toSeq
    assert(ciOrder != binOrder,
      "collation-weight ordering should differ from binary ordering on mixed-case/accented keys")
    // collation groups the 3 variants of each segment adjacently
    def fold(x: String) = x.toLowerCase.map(c => "áéíóú".indexOf(c) match {
      case -1 => c; case i => "aeiou"(i) })
    val folded = ciOrder.map(fold)
    assert(folded == folded.sorted, s"ci_rank must order by folded key: $ciOrder")
  }

  test("q90/q95 leave scale-growing fact-dim joins to AQE (no forced broadcast)") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    // q90: only the bounded dims (nation, region) may carry hints
    val q90 = SparkEntry.queries("q90_tpch_q5")(spark, sf).queryExecution.analyzed
    val q90Hints = q90.collect { case h: ResolvedHint => h }
    assert(q90Hints.size == 2, s"q90 expected 2 bounded-dim hints, got ${q90Hints.size}")
    q90Hints.foreach { h =>
      val sub = h.child.toString
      assert(!sub.contains("s_suppkey") && !sub.contains("l_orderkey"),
        s"q90 hints a scale-growing table:\n$sub")
    }
    // q95: part grows with SF — no hint at all
    val q95 = SparkEntry.queries("q95_tpch_q14")(spark, sf).queryExecution.analyzed
    assert(q95.collect { case h: ResolvedHint => h }.isEmpty,
      "q95 must not force-broadcast part")
  }

  test("q130 quantified ANY/ALL is two 1-row broadcasts, no per-row subquery") {
    // the TiDB-style rewrite: each quantified comparison collapses to a
    // broadcast of a single aggregated row — the outer table is never
    // shuffled and there is no join keyed on outer rows
    val p = planString("q130_quantified_any_all")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length === 2,
      s"expected exactly two 1-row broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"outer table must not shuffle:\n$p")
  }

  test("q26 global rank is range-partitioned and matches a naive global sort") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val df = SparkEntry.queries("q26_sort_full")(spark, sf)
    // globalRowNumber assigns ranks via RDD zipWithIndex over ONE
    // range-partitioned shuffle (boundaries sampled exactly once,
    // reused through shuffle files) — the result plan is a scan of the
    // pre-computed RDD, and NOTHING may be left persisted: the round-7
    // internal persist here leaked an input-sized cache per call site.
    val imrs = df.queryExecution.withCachedData.collect {
      case r: InMemoryRelation => r
    }
    assert(imrs.isEmpty, "scalable sort must not leave a persisted frame")
    val planStr0 = df.queryExecution.executedPlan.toString
    assert(planStr0.contains("ExistingRDD") || planStr0.contains("Scan"),
      s"expected a scan of the pre-ranked RDD:\n$planStr0")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.isEmpty,
      s"globalRowNumber must not register any persistent RDD; leaked ids $leaked")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val sel = df.select(col("s_suppkey").cast("long"), col("sort_pos").cast("long"))
    val got = sel.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val naive = sources.Tables.supplier(spark, sf)
      .select(col("s_suppkey"),
        row_number().over(W.orderBy(col("s_acctbal").desc, col("s_suppkey"))).cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == naive, "scalable global rank diverges from naive global window")
  }
}
