package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** SQL-frontier shapes (recursive CTE, LATERAL, VARIANT) and the
  * unigram-LM scorer: behavioral contracts plus the plan assertions
  * that make them 100 TB-shaped. */
class SqlFrontierSpec extends SparkTestBase {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q168 recursive chain: depth 0 covers every customer, depths shrink monotonically") {
    val rows = SparkEntry.queries("q168_recursive_cte")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.head == (0 -> nCust), s"depth-0 frontier must equal the customer count: ${rows.head}")
    assert(rows.map(_._2).sliding(2).forall(p => p(0) >= p(1)),
      s"frontier sizes must be non-increasing with depth: ${rows.mkString(",")}")
    // binary halving: depth bound is log2(max key) + 1
    val maxKey = spark.read.parquet(s"$sf/customer.parquet")
      .agg(org.apache.spark.sql.functions.max("c_custkey")).head.getLong(0)
    assert(rows.last._1 <= (63 - java.lang.Long.numberOfLeadingZeros(maxKey)) + 1)
  }

  test("q169 lateral top-k decorrelates to WindowGroupLimit — no nested-loop re-execution") {
    val p = planOf("q169_lateral_topk")
    assert(p.contains("WindowGroupLimit"),
      s"expected map-side group-limit top-k:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"lateral must not plan a per-row nested loop:\n$p")
  }

  test("q170 unigram LM: per-word quantized log-probs make scores exact integers") {
    val out = SparkEntry.queries("q170_unigram_lm")(spark, sf)
    val rows = out.collect()
    // every document scores, and nll is strictly positive (probs < 1)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.forall(_.getLong(2) > 0L))
    // rarest-word sensitivity: nll6/token of the corpus is bounded by
    // the worst single-word surprisal ln(V+T) in micro-nats
    val t = rows.map(r => r.getLong(2).toDouble / r.getLong(1)).max
    assert(t < 20e6, s"per-token nll must stay below 20 nats: $t")
  }

  test("q170 plan: vocabulary stats ride broadcasts, corpus is never collected") {
    val p = planOf("q170_unigram_lm")
    assert(p.contains("BroadcastExchange"), s"expected 1-row stats broadcast:\n$p")
  }

  test("q174 bigram LM: only multi-token docs score, conditional surprisal bounded") {
    val rows = SparkEntry.queries("q174_bigram_lm")(spark, sf).collect()
    val multi = spark.read.parquet(s"$sf/documents.parquet")
      .where(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")) >= 2).count()
    assert(rows.length == multi, "every >=2-token doc must score, others must not")
    assert(rows.forall(_.getLong(2) > 0L))
    // bigram models the word ORDER: per-pair nll below ln(V^2)-ish cap
    assert(rows.forall(r => r.getLong(2).toDouble / r.getLong(1) < 20e6))
  }

  test("q175 textrank: top-word set broadcast-semi-filters the pair stream") {
    val p = planOf("q175_textrank")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast semi filter by the bounded top-word set:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"node set must be capped by top-k:\n$p")
    // damping floor: every rank ≥ 150000, and the keyword list is full
    val rows = SparkEntry.queries("q175_textrank")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(1) >= 150000L))
  }

  test("q176 naive bayes: every doc classified once, accuracy beats chance") {
    val rows = SparkEntry.queries("q176_naive_bayes")(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs, "exactly one prediction per document")
    val nCls = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    val acc = rows.map(_.getLong(3)).sum.toDouble / rows.length
    assert(acc > 1.5 / nCls,
      f"accuracy $acc%.3f should beat chance ${1.0 / nCls}%.3f with margin")
    // scores are strictly negative log-space sums
    assert(rows.forall(_.getLong(2) < 0L))
  }

  test("q172 zipf: rank window consumes a bounded top-200, not the vocabulary") {
    val p = planOf("q172_zipf_slope")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab must be capped by top-k before the rank window:\n$p")
  }

  test("q173 variant round-trips typed values through parse_json/variant_get") {
    val rows = SparkEntry.queries("q173_variant")(spark, sf).collect()
    assert(rows.nonEmpty)
    // constructed variant echoes the relational columns exactly
    assert(rows.forall(r => r.getLong(5) == r.getLong(0)), "id must round-trip")
    assert(rows.forall(r => r.isNullAt(2)), "missing path must be NULL")
  }

  test("q196 PMI: symmetric in count bounds and capped by -ln p(a)p(b)") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q196_pmi_collocations")(spark, sf)
    val rows = r.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(2) >= 5),
      "HAVING >= 5 must hold")
    // PMI <= min(-ln p(a), -ln p(b)) <= ln N; micro-nat cap with slack
    val n = sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    val cap = (math.log(n.toDouble) * 1e6).toLong + 1000
    assert(rows.forall(x => math.abs(x.getLong(3)) <= cap),
      "micro-nat PMI out of information-theoretic range")
  }

  test("q203 CCNet buckets: per-language terciles are balanced and exhaustive") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q203_ccnet_buckets")(spark, sf)
    assert(r.select("bucket").distinct().collect().map(_.getString(0)).toSet ===
      Set("head", "middle", "tail"))
    // per language, tercile sizes differ by at most 1 (exact rank split)
    val bad = r.groupBy("lang").pivot("bucket").count()
      .withColumn("mx", greatest(col("head"), col("middle"), col("tail")))
      .withColumn("mn", least(col("head"), col("middle"), col("tail")))
      .filter(col("mx") - col("mn") > 1)
    assert(bad.isEmpty, "terciles must be balanced within each language")
    // head has the LOWEST perplexity (CCNet keeps head as cleanest)
    val byBucket = r.groupBy("bucket").agg(avg("ppl6").as("m"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(byBucket("head") < byBucket("middle") &&
      byBucket("middle") < byBucket("tail"))
  }

  test("q209 AUC harness: null labels calibrate to ~0.5, planted signal reads ~1.0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // corpus labels are content-independent → AUC must sit near 0.5
    val r = SparkEntry.queries("q209_auc_eval")(spark, sf).head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(math.abs(r.getLong(2) - 500000L) < 100000L,
      s"null-calibration AUC should be ~0.5, got ${r.getLong(2)} ppm")
    // the same harness on an informative score must detect the signal
    val planted = (0 until 400).map(i =>
      (i.toLong, if (i % 4 == 0) 1 else 0,
        (if (i % 4 == 0) 1000 + i else i).toLong))
      .toDF("doc_id", "pos", "score")
    val auc = operators.LangModel.aucFrom(planted).head().getLong(2)
    assert(auc > 990000L, s"planted perfect separation must read ~1.0, got $auc")
    // and the reversed score reads ~0
    val inv = planted.withColumn("score", -col("score"))
    assert(operators.LangModel.aucFrom(inv).head().getLong(2) < 10000L)
  }

  test("q209b tie-corrected AUC: constant scorer reads exactly 0.5; agrees with brute force under ties") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // constant score: every pair is a tie -> mid-rank AUC is EXACTLY
    // 500000 ppm (q209's uncorrected form is order-dependent here)
    val const = (0 until 100).map(i => (i.toLong, i % 3 min 1, 7L))
      .toDF("doc_id", "pos", "score")
    assert(operators.LangModel.aucTieCorrectedFrom(const).head().getLong(2)
      === 500000L)
    // tie-heavy fixture vs brute force: AUC = (#(s+>s-) + #(s+=s-)/2) / (n+ n-)
    val rows = (0 until 200).map(i => (i.toLong, i % 2, (i % 7).toLong))
    val brute = {
      val p = rows.filter(_._2 == 1).map(_._3)
      val n = rows.filter(_._2 == 0).map(_._3)
      val num = (for (a <- p; b <- n)
        yield if (a > b) 2L else if (a == b) 1L else 0L).sum
      num * 1000000L / (2L * p.size * n.size)
    }
    val got = operators.LangModel
      .aucTieCorrectedFrom(rows.toDF("doc_id", "pos", "score")).head()
    assert(got.getLong(2) === brute,
      s"mid-rank AUC must equal the brute-force pair count: $got vs $brute")
    // tie-free data: corrected and uncorrected forms coincide
    val free = (0 until 150).map(i => (i.toLong, i % 5 min 1, (i * 13 % 151).toLong))
      .toDF("doc_id", "pos", "score")
    assert(operators.LangModel.aucTieCorrectedFrom(free).head().getLong(2)
      === operators.LangModel.aucFrom(free).head().getLong(2))
  }

  test("q196 PMI plan: corpus pair stream shuffles once into the pair aggregate") {
    val p = planOf("q196_pmi_collocations")
    // pair-key exchange + unigram-key exchange(s) are Heaps-bounded;
    // the corpus-sized explode must feed exactly one hash exchange on
    // (w1, w2) — no positional self-join of the token stream
    assert(!p.contains("CartesianProduct"), s"no cross product:\n$p")
    assert("Exchange hashpartitioning\\(w1".r.findAllIn(p).length <= 2,
      s"pair stream must not re-shuffle:\n$p")
  }
}
