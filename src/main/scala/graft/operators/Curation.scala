package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import graft.sources.Tables

/** Corpus-curation operators beyond the per-document pipeline in
  * `TextPipeline`: benchmark decontamination and the domain-mixture
  * sampling plan — the two corpus-level passes a pretraining pipeline
  * runs between dedup and the tokenizer.
  */
object Curation {

  /** Benchmark decontamination: flag corpus documents containing a
    * verbatim snippet of any held-out benchmark item. The benchmark set
    * derives deterministically from the corpus (every 41st doc donates
    * a 15-char snippet) so the overlap is provable; in production it is
    * the eval suite. Scale shape: the benchmark side is bounded (eval
    * suites are thousands of items, not corpus-sized), so it
    * broadcasts, and the corpus side is a single scan with a per-row
    * substring probe — no shuffle of the corpus at all. For benchmark
    * sets large enough that per-row `contains` over every snippet hurts,
    * the same broadcast carries an Aho-Corasick automaton through
    * `mapPartitions`; the join shape is unchanged.
    */
  val q117Decontaminate: QueryDef = QueryDef(
    "q117_decontaminate",
    """WITH bench AS (
      |  SELECT doc_id AS bench_id, substr(text, 11, 15) AS snippet
      |  FROM documents WHERE doc_id % 41 = 0 AND length(text) >= 26)
      |SELECT bench_id, COUNT(DISTINCT d.doc_id) AS n_contaminated
      |FROM bench b JOIN documents d ON position(b.snippet IN d.text) > 0
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val bench = docs
      .filter(col("doc_id") % 41 === 0 && length(col("text")) >= 26)
      .select(col("doc_id").as("bench_id"),
        substring(col("text"), 11, 15).as("snippet"))
    docs.select(col("doc_id"), col("text"))
      .join(broadcast(bench), col("text").contains(col("snippet")))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("doc_id")).as("n_contaminated"))
  }

  /** Domain-mixture plan: per-source sampling weights and quotas under
    * sqrt (temperature = 0.5) size weighting — how a pipeline decides
    * how much of each source a training mix takes. All shares are
    * computed in integer math (sqrt rounded to 6 dp, lifted to exact
    * decimal micro-units, integer division) so the result is
    * bit-deterministic across engines and partitionings: IEEE sqrt is
    * correctly rounded, and everything after it is exact. The global
    * total rides a 1-row broadcast join (the q102 pattern), never a
    * single-partition window.
    */
  val q119DomainMixture: QueryDef = QueryDef(
    "q119_domain_mixture",
    """WITH s AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
      |    CAST(CAST(round(sqrt(SUM(n_chars)), 6) AS DECIMAL(20,6))
      |         * 1000000 AS BIGINT) AS sd6
      |  FROM documents GROUP BY source),
      |t AS (SELECT SUM(sd6) AS tot6 FROM s)
      |SELECT source, n_docs, n_chars_total,
      |  CAST(sd6 * 1000000 // tot6 AS BIGINT) AS weight_ppm,
      |  CAST((10000 * sd6) // tot6 AS BIGINT) AS quota
      |FROM s, t""".stripMargin) { (s, d) =>
    val perSrc = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
      .withColumn("sd6",
        (round(sqrt(col("n_chars_total")), 6).cast(DecimalType(20, 6)) *
          1000000).cast("long"))
    val tot = perSrc.agg(sum(col("sd6")).as("tot6"))
    perSrc.join(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_chars_total"),
        expr("sd6 * 1000000 div tot6").as("weight_ppm"),
        expr("(10000 * sd6) div tot6").as("quota"))
  }

  val all: Seq[QueryDef] = Seq(q117Decontaminate, q119DomainMixture)
}
