package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Contract tests for the surfaces whose exact values are
  * implementation-defined: the JSON codec roundtrip (≙ the reference's
  * binary JSON, `FunctionsJson.cpp`) and the approximate aggregates'
  * error bounds (≙ `uniqRawRes` / quantile sketches, which promise a
  * contract, not bit-equality). */
class ContractsSpec extends SparkTestBase {

  test("JSON roundtrip: to_json/from_json preserve structured rows") {
    val o = Tables.orders(spark, sf).limit(500)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    val roundtrip = o
      .withColumn("j", to_json(struct(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))))
      .withColumn("back", from_json(col("j"), schema))
      .filter(col("back.o_orderkey") =!= col("o_orderkey") ||
        col("back.o_orderstatus") =!= col("o_orderstatus") ||
        col("back.o_totalprice") =!= col("o_totalprice"))
    assert(roundtrip.count() === 0)
  }

  test("json_tuple and array functions on constructed documents") {
    val r = spark.sql(
      """SELECT get_json_object(j, '$.a') AS a,
        |       json_array_length(get_json_object(j, '$.xs')) AS n,
        |       json_object_keys(j) AS ks
        |FROM (SELECT '{"a": "v", "xs": [1,2,3]}' AS j)""".stripMargin).first()
    assert(r.getString(0) === "v")
    assert(r.getInt(1) === 3)
    assert(r.getSeq[String](2).toSet === Set("a", "xs"))
  }

  test("approx_count_distinct within documented rsd of exact") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).first()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact beyond tolerance")
  }

  test("q156 HLL sketch: partial-union == direct sketch; estimates near exact") {
    // The mergeability law that makes stored sketches a valid 100 TB
    // rollup: unioning per-group partials must estimate the SAME value
    // as sketching the whole column directly (register-wise max is
    // order- and partition-invariant), and both must sit within the
    // lgK=14 error envelope of the exact distinct count.
    val li = Tables.lineitem(spark, sf)
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey"), 14).as("sk"))
    val merged = perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), 14)).as("est"))
      .head().getLong(0)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(merged === direct,
      s"union of partial sketches ($merged) must equal the direct sketch ($direct)")
    assert(math.abs(direct - exact).toDouble / exact < 0.05,
      s"estimate $direct vs exact $exact out of the error envelope")
  }

  test("percentile_approx brackets the exact percentile") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact_p50"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_p50"))
      .first()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx p50 $approx vs exact $exact")
  }

  test("q116 grouped approx percentiles track exact per group") {
    val rows = SparkEntry.queries("q116_approx_percentile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a50, a95) = (r.getDouble(1), r.getDouble(2))
      val (e50, e95) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(a50 - e50) / e50 < 0.02,
        s"${r.getString(0)}: p50 approx $a50 vs exact $e50")
      assert(math.abs(a95 - e95) / e95 < 0.02,
        s"${r.getString(0)}: p95 approx $a95 vs exact $e95")
    }
  }

  test("q134 compression-ratio signal separates repetition from prose") {
    import spark.implicits._
    // ground truth on constructed docs: pure repetition must compress
    // an order of magnitude harder than high-entropy text
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 200),
      (2L, (0 until 2000).map(i => (i * 2654435761L % 99991).toString).mkString(" ")),
      (3L, "")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("q134_docs")
    val compute = operators.TextPipeline.q134CompressRatio.fn
    // run against real testdata for shape + determinism
    val real = compute(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(2) > 0, "deflate output must be non-empty")
      assert(r.getDouble(3) <= 1.2, s"ratio ${r.getDouble(3)} implausibly high")
    }
    val again = compute(spark, sf).collect()
    assert(real.map(_.getLong(2)).sum === again.map(_.getLong(2)).sum,
      "deflate lengths must be deterministic")
    // constructed-doc separation via the same mapPartitions codec
    val enc = docs.as[(Long, String)].mapPartitions { it =>
      val defl = new java.util.zip.Deflater(6)
      val buf = new Array[Byte](8192)
      it.map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        defl.reset(); defl.setInput(bytes); defl.finish()
        var total = 0L
        while (!defl.finished()) total += defl.deflate(buf)
        (id, bytes.length.toLong, total)
      }
    }.collect().map(t => t._1 -> (t._3.toDouble / math.max(t._2, 1))).toMap
    assert(enc(1L) < 0.05, s"pure repetition should compress hard: ${enc(1L)}")
    assert(enc(2L) > 0.3, s"high-entropy text should resist: ${enc(2L)}")
    assert(enc(1L) * 5 < enc(2L), "signal must separate the two regimes")
  }

  test("q137 Misra-Gries sketch honors the space-saving guarantees") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val cap = functions.ApproxTopK.defaultCap
    def sketchOf(tokens: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val mg = udaf(new functions.MisraGriesAgg(cap), org.apache.spark.sql.Encoders.STRING)
      val s = tokens.agg(mg(col("tok"))).collect()(0).getString(0)
      if (s.isEmpty) Map.empty
      else s.split(";").map { e =>
        val i = e.lastIndexOf(':'); e.substring(0, i) -> e.substring(i + 1).toLong
      }.toMap
    }
    // constructed skew: 'hh' is 30% of the stream, the rest unique —
    // far above N/(cap+1), so MG MUST report it, with bounded error
    val n = 10000
    val skewed = ((0 until (n * 3 / 10)).map(_ => "hh") ++
      (0 until (n * 7 / 10)).map(i => s"u$i")).toDF("tok").repartition(8)
    val sk = sketchOf(skewed)
    val trueHH = (n * 3 / 10).toLong
    assert(sk.contains("hh"), s"guaranteed heavy hitter missing from $sk")
    assert(sk("hh") <= trueHH, "MG estimates never exceed the true count")
    assert(trueHH - sk("hh") <= n.toLong / (cap + 1),
      s"error ${trueHH - sk("hh")} beyond the N/(cap+1) bound")
    // real corpus: every reported estimate obeys est <= true <= est + N/(cap+1)
    val toks = sources.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    val total = toks.count()
    val exact = toks.groupBy(col("tok")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rsk = sketchOf(toks)
    assert(rsk.nonEmpty)
    rsk.foreach { case (t, est) =>
      val tru = exact.getOrElse(t, 0L)
      assert(est <= tru, s"$t: estimate $est above true $tru")
      assert(tru - est <= total / (cap + 1),
        s"$t: error ${tru - est} beyond bound ${total / (cap + 1)}")
    }
  }

  test("rand(seed) contract: [0,1) range, seed-deterministic, roughly uniform") {
    // ≙ the reference's rand (DAGUtils.cpp) — value contract only, no
    // cross-engine oracle possible for a PRNG
    val base = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    def sample() = base.withColumn("r", rand(42)).select(sum(col("r")), count(lit(1)),
      min(col("r")), max(col("r"))).first()
    val a = sample(); val b = sample()
    assert(a.getDouble(0) === b.getDouble(0), "same seed must reproduce")
    val (total, n, mn, mx) = (a.getDouble(0), a.getLong(1), a.getDouble(2), a.getDouble(3))
    assert(mn >= 0.0 && mx < 1.0)
    assert(math.abs(total / n - 0.5) < 0.05, s"mean ${total / n} far from 0.5")
  }

  test("q198 count-min sketch honors the one-sided εN error bound") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q198_countmin")(spark, sf).collect()
    assert(r.length == 20, "exact top-20 probe set")
    // CMS never underestimates
    assert(r.forall(x => x.getLong(2) >= x.getLong(1)),
      "count-min must be one-sided: est >= true")
    val n = sources.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "").count()
    // ε = e/w per row; the min over 4 rows sits far below one row's
    // expected excess on deterministic data — allow 2·e·N/w slack
    val bound = (2 * math.E * n) / functions.ApproxTopK.cmBuckets
    assert(r.forall(x => (x.getLong(2) - x.getLong(1)) <= bound),
      s"excess above ${bound.toLong}: " +
        r.map(x => s"${x.getString(0)}:${x.getLong(2) - x.getLong(1)}").mkString(","))
    // and the sketch is genuinely mergeable: cells are plain sums, so
    // a two-way split of the corpus must reproduce identical cells
    val toks = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("tok"), explode(array((1 to 4).map(lit): _*)).as("row"))
      .withColumn("bucket", pmod(xxhash64(col("tok"), col("row")), lit(512)))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cell"))
    val whole = cellsOf(toks)
    val merged = cellsOf(toks.filter(col("doc_id") % 2 === 0))
      .union(cellsOf(toks.filter(col("doc_id") % 2 === 1)))
      .groupBy("row", "bucket").agg(sum("cell").as("cell"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty,
      "split-and-merge must equal the one-shot sketch")
  }
}
