package graft

import org.apache.spark.sql.functions._
import graft.operators.{InvertedText, Similarity}
import graft.sources.Tables
import graft.streaming.PileProbes

/** The scored pile probes must reproduce their batch counterparts
  * exactly — the same ≡-rebuild contract the DuckDB gate scores at
  * sf0.01, pinned here at test scale so a probe-path regression fails
  * fast and locally. */
class PileProbesSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("q264: postings-pile probe equals the batch q75 answer") {
    val probe = rows(PileProbes.q264FulltextStream.fn(spark, sf))
    val batch = rows(InvertedText.q75FulltextAnd.fn(spark, sf))
    assert(probe === batch && probe.nonEmpty,
      "the maintained-postings probe must equal the from-scratch index answer")
  }

  test("q265: agg-MV pile fold equals the from-scratch rollup") {
    val probe = rows(PileProbes.q265AggMvStream.fn(spark, sf))
    val batch = rows(Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("vsum")))
    assert(probe === batch && probe.nonEmpty,
      "the folded MV must equal the raw-events rollup bit-for-bit")
  }

  test("q267: BM25 served from the tf-postings + doc-stats piles equals batch q75b") {
    val probe = rows(PileProbes.q267Bm25Stream.fn(spark, sf))
    val batch = rows(InvertedText.q75bBm25.fn(spark, sf))
    assert(probe === batch && probe.nonEmpty,
      "the pile-served ranked answer must equal the from-scratch BM25 " +
        "top-k bit-for-bit (scores included)")
  }

  test("q269: phrase search from the positional pile equals the batch q142 answer") {
    val probe = rows(PileProbes.q269PhraseStream.fn(spark, sf))
    val batch = rows(InvertedText.q142PhraseSearch.fn(spark, sf))
    assert(probe === batch && probe.nonEmpty,
      "the pile-served phrase answer must equal the from-scratch index answer")
  }

  test("q268: pile-served hybrid fusion is internally consistent and ppm-exact") {
    // the legs' correctness is pinned by q267/q266 ≡-batch tests and
    // the DuckDB oracle; this pins the FUSION: rrf_ppm must be the
    // exact integer-ppm combiner of the emitted ranks, the output
    // sorted by (rrf_ppm desc, doc_id), and both legs represented
    val out = PileProbes.q268HybridRrfStream.fn(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 10)
    def ppm(r: Int): Long = if (r == 0) 0L else 1000000L / (60 + r)
    out.foreach { r =>
      val (rb, rv, got) = (r.getInt(1), r.getInt(2), r.getLong(3))
      assert(got === ppm(rb) + ppm(rv),
        s"rrf_ppm must be the exact integer combiner: doc ${r.getLong(0)}")
      assert(rb > 0 || rv > 0, "a fused row must come from at least one leg")
    }
    val keys = out.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(keys === keys.sorted, "fusion output must be (rrf_ppm desc, doc_id)")
    assert(out.exists(_.getInt(1) > 0) && out.exists(_.getInt(2) > 0),
      "both the lexical and the vector leg must contribute at this SF")
  }

  test("q266: rotated-pile probe equals batch q58 (rotation re-assigned everything)") {
    // the seed quantizer (tick-0-trained) must differ from the rotated
    // one for the equality to be evidence of re-assignment, not of a
    // no-op rotation
    val e = Tables.embeddings(spark, sf)
    val seed = Similarity.ivfCentroids(
        e.filter(pmod(col("vec_id"), lit(3)) === 0))
      .collect().map(_.getLong(0)).toSet
    val full = Similarity.ivfCentroids(e).collect().map(_.getLong(0)).toSet
    assert(seed !== full,
      "fixture degenerate: seed and rotated quantizers coincide")
    val probe = rows(PileProbes.q266AnnIvfRotate.fn(spark, sf))
    val batch = rows(Similarity.q58AnnIvf.fn(spark, sf))
    assert(probe === batch && probe.nonEmpty,
      "the rotated pile's probe must equal the batch IVF answer")
  }
}
