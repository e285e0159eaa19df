package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016, the
  * public byte-pair-encoding algorithm behind GPT/Llama-style
  * tokenizers) — the missing half of the token surface: q66 counts
  * tokens with a fixed regex; this trains the merge table itself from
  * the corpus. Beyond the reference's own scope (its text surface stops
  * at collation/regexp, `dbms/src/Functions/FunctionsStringSearch.h`);
  * required for the LLM-pipeline scope — tokenizer fitting is a
  * corpus-scale pre-training job.
  *
  * Scale shape (the part that must survive 100 TB): BPE trains on WORD
  * FREQUENCIES, not the raw token stream — the corpus is shuffled
  * exactly ONCE into a (word, count) table whose size is the distinct
  * vocabulary (≪ corpus; Heaps' law), and every merge iteration runs on
  * that small table: one pair-explode + partial-agg pair count, then a
  * global top-1 via TakeOrderedAndProject (one row to the driver per
  * round — the same bounded-iteration driver loop as the k-means
  * trainer, `Clustering.scala`). The merge application is a per-word
  * left fold (Catalyst `aggregate` HOF over arrays that are at most
  * word-length — bounded, not corpus-sized). At production merge counts
  * (30k+) the word table would be re-checkpointed every ~50 rounds to
  * cap the HOF chain; the bounded driver loop itself is the published
  * algorithm's structure, not a shortcut.
  *
  * Tiebreak contract: highest pair count, then lexicographic (left,
  * right) ascending — fully deterministic at any partitioning (the
  * count is an exact integer sum).
  */
object Tokenizer {

  /** Lowercased alphabetic words with frequencies; token column starts
    * as the per-character split. */
  def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .withColumn("toks", charSplit(col("word")))

  /** Per-character split ('(?!^)' leaves a trailing empty match). */
  def charSplit(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(word, "(?!^)"), t => t =!= "")

  /** One greedy left-to-right merge pass of (l, r) -> l+r over a token
    * array — the BPE apply step as a Catalyst fold (no UDF). "aaa" with
    * merge (a,a) becomes [aa, a]: a just-formed merge does not re-merge
    * with the next element, matching the reference algorithm. */
  def applyMerge(toksCol: String, l: String, r: String): org.apache.spark.sql.Column =
    expr(
      s"""aggregate($toksCol, cast(array() as array<string>),
         |  (acc, t) -> case
         |    when size(acc) > 0 and element_at(acc, -1) = '$l' and t = '$r'
         |    then concat(slice(acc, 1, size(acc) - 1), array('$l$r'))
         |    else concat(acc, array(t)) end)""".stripMargin)

  /** Adjacent-pair frequencies over the word table (pairs weighted by
    * word count; map-side partial aggregation). */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(col("wcnt"), col("toks"))
      .select(col("wcnt"), posexplode(col("toks")).as(Seq("i", "l")),
        col("toks"))
      .withColumn("r", expr("try_element_at(toks, cast(i + 2 as int))"))
      .where(col("r").isNotNull)
      .groupBy("l", "r").agg(sum(col("wcnt")).as("cnt"))

  /** Trains `numMerges` merges; returns (rank, left, right, freq). */
  def bpeTrain(docs: DataFrame, numMerges: Int): Seq[(Int, String, String, Long)] = {
    var words = wordTable(docs).cache()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, c))
        val next = words.withColumn("toks", applyMerge("toks", l, r)).cache()
        next.count() // materialize before unpersisting the parent
        words.unpersist()
        words = next
        rank += 1
      }
    }
    words.unpersist()
    merges.result()
  }

  /** Applies a trained merge table in rank order (each merge one fold
    * pass — the published apply algorithm). */
  def encodeWords(words: DataFrame, merges: Seq[(Int, String, String, Long)]): DataFrame =
    merges.sortBy(_._1).foldLeft(words) { case (df, (_, l, r, _)) =>
      df.withColumn("toks", applyMerge("toks", l, r))
    }

  /** BPE ENCODE over the corpus with the table trained on it — the
    * apply half of the tokenizer loop. Scale shape: the merge chain
    * runs on the DISTINCT-word table only; the corpus-sized side is a
    * plain (doc_id, word) equi-join + one doc_id aggregate. Per-doc
    * outputs: word/char/BPE-token counts and the chars-per-token
    * compression in exact integer ppm. */
  def bpeEncodeStats(docs: DataFrame, numMerges: Int): DataFrame = {
    val merges = bpeTrain(docs, numMerges)
    val docWords = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(length(col("word")) > 0)
    val vocab = encodeWords(
      docWords.groupBy("word").agg(count(lit(1)).as("wcnt"))
        .withColumn("toks", charSplit(col("word"))), merges)
      .select(col("word"), size(col("toks")).as("ntoks"),
        length(col("word")).as("nchars"))
    docWords.join(vocab, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("nchars")).as("n_chars"),
        sum(col("ntoks")).as("n_tokens"))
      .withColumn("chars_per_token_ppm",
        expr("n_chars * 1000000L div n_tokens"))
  }

  val q158BpeEncode: QueryDef = QueryDef.noOracle("q158_bpe_encode") { (s, d) =>
    bpeEncodeStats(Tables.documents(s, d), numMerges = 8)
  }

  /** Merge-table training over the documents corpus. The iterative
    * argmax chain is not ANSI-SQL-expressible -> rows-only; the
    * ground-truth contract (the BPE paper's low/lower/newest/widest
    * corpus with hand-computed merges) lives in `TokenizerSpec`. */
  val q157BpeTrain: QueryDef = QueryDef.noOracle("q157_bpe_train") { (s, d) =>
    import s.implicits._
    Tokenizer.bpeTrain(Tables.documents(s, d), numMerges = 8)
      .toDF("rank", "left", "right", "freq")
  }

  val all: Seq[QueryDef] = Seq(q157BpeTrain, q158BpeEncode)
}
