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

  /** BM25-ranked retrieval over the inverted index (≙ the reference's
    * scored FullTextIndex reads, `Index/FullTextIndex/Reader.h`):
    * score(D,Q) = Σ_t idf(t)·tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl)),
    * k1=1.2, b=0.75, idf = ln((N−df+0.5)/(df+0.5)+1). Scale shape:
    * the tf table is filtered to the probed terms BEFORE any
    * aggregation (against a stored index this is the pushed `IN`
    * probe), doc lengths are the index-build side table, N/avgdl is a
    * broadcast 1-row summary, and top-k goes through
    * TakeOrderedAndProject. Determinism: each per-term contribution is
    * a single double (no fold), and the final score adds the per-term
    * conditional sums in a FIXED literal order on both engines, so the
    * doubles are bit-identical and the (score, doc_id) ordering
    * agrees. */
  val q75bBm25: QueryDef = QueryDef(
    "q75b_bm25_ranked",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |              CAST(SUM(dl) AS BIGINT) AS total FROM dl),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
      |       WHERE term IN ('hash', 'join', 'scan') GROUP BY doc_id, term),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |co AS (SELECT tf.doc_id, tf.term,
      |         ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1)
      |           * (tf.tf * 2.2)
      |           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
      |                / (CAST(st.total AS DOUBLE) / st.n))) AS c
      |       FROM tf JOIN df ON tf.term = df.term
      |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  round(COALESCE(SUM(CASE WHEN term = 'hash' THEN c END), 0)
      |      + COALESCE(SUM(CASE WHEN term = 'join' THEN c END), 0)
      |      + COALESCE(SUM(CASE WHEN term = 'scan' THEN c END), 0), 6) AS bm25
      |FROM co GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
    val terms = Seq("hash", "join", "scan")
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens).as("term"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val st = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("total"))
    val tf = tok.filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
      (col("tf") * 2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") /
        (col("total").cast("double") / col("n"))))
    val co = tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .select(col("doc_id"), col("term"), contrib.as("c"))
    def termSum(t: String) =
      coalesce(sum(when(col("term") === t, col("c"))), lit(0.0))
    co.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        round(termSum("hash") + termSum("join") + termSum("scan"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)
  }

  /** Per-document term frequencies + document length — the row layout
    * the BM25-at-ingest pile stores ([[graft.streaming.Ingest
    * .streamTfPostingsIngest]]): (term, doc_id, tf, dl). dl is
    * denormalized onto every row so a term-pruned probe is
    * self-contained (no corpus-side doc-length join at read time);
    * doc_ids are batch-disjoint under incremental ingest, so segments
    * never need a merge fold — they are append-only facts like the
    * LSH banding rows. One batch-local groupBy + a batch-local dl
    * join; cost O(batch tokens). */
  def buildTfPostings(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens).as("term"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
  }

  /** Positional postings: term → sorted (doc_id, pos) occurrences —
    * the index layout phrase and proximity queries need (the
    * with-positions variant of `buildPostings`; same one-groupBy build,
    * same term-keyed pruning at probe time). */
  def buildPositionalPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(tokens).as(Seq("pos", "term")))
      .groupBy(col("term"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pos")))).as("postings"),
        count(lit(1)).as("tf_total"))

  /** Exact-phrase search over positional postings: occurrences where
    * `second` appears at `first`'s position + 1. Only the two probed
    * terms' posting rows are read (term filter prunes the stored
    * index); the adjacency self-join runs over those postings alone —
    * cost ∝ posting sizes, never corpus size. */
  def searchPhrase(postings: DataFrame, first: String, second: String): DataFrame = {
    val a = postings.filter(col("term") === first)
      .select(explode(col("postings")).as("e"))
      .select(col("e.doc_id").as("doc_id"), col("e.pos").as("pa"))
    val b = postings.filter(col("term") === second)
      .select(explode(col("postings")).as("e"))
      .select(col("e.doc_id").as("doc_b"), col("e.pos").as("pb"))
    a.join(b, col("doc_id") === col("doc_b") && col("pb") === col("pa") + 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
  }

  /** Phrase query "hash join" through the positional index. */
  val q142PhraseSearch: QueryDef = QueryDef(
    "q142_phrase_search",
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |p AS (SELECT doc_id, w[i] AS term, i AS pos
      |      FROM t, UNNEST(range(1, len(w) + 1)) AS u(i))
      |SELECT a.doc_id, COUNT(*) AS n_occurrences
      |FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |WHERE a.term = 'hash' AND b.term = 'join'
      |GROUP BY a.doc_id""".stripMargin) { (s, d) =>
    searchPhrase(buildPositionalPostings(Tables.documents(s, d)), "hash", "join")
  }

  val all: Seq[QueryDef] =
    Seq(q75FulltextAnd, q76PostingLists, q75bBm25, q142PhraseSearch)
}
