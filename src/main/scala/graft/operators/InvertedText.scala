package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Inverted-index full-text search — the Spark analog of the
  * reference's inverted / full-text index scans
  * (`/root/reference/dbms/src/Storages/DeltaMerge/Index/InvertedIndex/`,
  * `Index/FullTextIndex/Reader.h`): a token → posting-list table that
  * answers CONTAINS-style queries by joining through the postings,
  * instead of scanning and regex-filtering every document.
  *
  * 100 TB shape: `buildPostings` is one hash-partitioned groupBy on the
  * term (high-cardinality key) and is written out once as the index
  * table, term-sorted so a parquet reader range-prunes; at query time
  * `search*` touches only the probed terms' rows — an `IN (terms)`
  * predicate that reaches the parquet scan as a pushed filter
  * (`InvertedIndexSpec` asserts PushedFilters on the stored index), so
  * query cost is ∝ posting-list size, not corpus size.
  */
object InvertedText {

  private val tokens = split(trim(col("text")), "\\s+")

  /** token → (sorted posting list, document frequency). One groupBy on
    * term; `array_distinct` before explode keeps per-doc duplicate
    * terms from inflating the shuffle. */
  def buildPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(tokens)).as("term"))
      .groupBy(col("term"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"),
        count(lit(1)).as("df"))

  /** AND-semantics search: docs containing every probe term. The term
    * filter sits on the posting table's key, so against a stored index
    * it prunes to |terms| rows before any explode. */
  def searchAll(postings: DataFrame, terms: Seq[String]): DataFrame =
    postings
      .filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .select(col("term"), explode(col("postings")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("n_terms"))
      .filter(col("n_terms") === terms.size)

  /** OR-semantics search with matched-term list and a df-weighted
    * rarity score (rarer terms score higher — the idf shape). */
  def searchAny(postings: DataFrame, terms: Seq[String], totalDocs: Long): DataFrame =
    postings
      .filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .select(col("term"), col("df"), explode(col("postings")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("term"))).as("matched"),
        round(sum(log(lit(totalDocs.toDouble) / col("df"))), 6).as("idf_score"))

  // ------------------------------------------------------------ queries
  private val probeTerms = Seq("hash", "join")

  /** CONTAINS-all query answered through the posting table. */
  val q75FulltextAnd: QueryDef = QueryDef(
    "q75_fulltext_and",
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS term
      |  FROM documents),
      |hits AS (SELECT doc_id, term FROM tok WHERE term IN ('hash', 'join'))
      |SELECT doc_id, COUNT(DISTINCT term) AS n_terms
      |FROM hits GROUP BY doc_id HAVING COUNT(DISTINCT term) = 2""".stripMargin) {
    (s, d) => searchAll(buildPostings(Tables.documents(s, d)), probeTerms)
  }

  /** The posting lists themselves for the probed terms (the index-table
    * contract: sorted postings + document frequency). */
  val q76PostingLists: QueryDef = QueryDef(
    "q76_posting_lists",
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS term
      |  FROM documents)
      |SELECT term, array_to_string(list_sort(list(doc_id)), ',') AS postings, COUNT(*) AS df
      |FROM tok WHERE term IN ('hash', 'join', 'scan')
      |GROUP BY term""".stripMargin) { (s, d) =>
    // postings serialized to CSV: the driver's pandas compare crashes on
    // ARRAY output columns ("unhashable type: numpy.ndarray").
    buildPostings(Tables.documents(s, d))
      .filter(col("term").isin("hash", "join", "scan"))
      .select(col("term"), array_join(col("postings"), ",").as("postings"), col("df"))
  }

  val all: Seq[QueryDef] = Seq(q75FulltextAnd, q76PostingLists)
}
