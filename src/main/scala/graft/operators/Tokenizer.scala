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
        words.unpersist(blocking = true)
        words = next
        rank += 1
      }
    }
    words.unpersist(blocking = true)
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

  val all: Seq[QueryDef] = Seq(q157BpeTrain, q158BpeEncode,
    UnigramTokenizer.q200UnigramTok)
}

/** Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece "unigram" algorithm behind T5/ALBERT tokenizers),
  * hard-EM (Viterbi) variant: seed a substring vocabulary from corpus
  * frequencies, then alternate (E) best segmentation of every word
  * under current piece log-probs with (V) re-estimating piece
  * probabilities from the segmentation counts. The complement of BPE
  * above: BPE grows merges bottom-up, unigram prunes a rich seed
  * top-down to the pieces that EXPLAIN the corpus.
  *
  * Scale shape (same discipline as `Tokenizer.bpeTrain`): everything
  * iterative runs on the DISTINCT-word table (Heaps-bounded, ≪
  * corpus — the corpus is shuffled exactly once to build it). The
  * piece table is capped at `seedSize` + alphabet, so each EM round is
  * one broadcast of the vocab map + one word-table scan + one
  * piece-keyed partial aggregate; the vocab collect is the same
  * bounded driver materialization as the k-means centroid collect
  * (`Clustering.scala`), NOT a corpus collect.
  *
  * Determinism: piece log-probs are quantized to integer micro-nats
  * once per piece; the Viterbi DP sums those integers (no float adds),
  * ties prefer the longer trailing piece — bit-identical at any
  * partitioning or merge order, which the TokenizerSpec partition-
  * invariance test pins.
  */
object UnigramTokenizer {
  val maxPieceLen = 4

  /** All substrings of length 1..maxPieceLen, count-weighted — pure
    * codegen HOFs, no UDF (the corpus-independent seed step). */
  def substringCounts(words: DataFrame): DataFrame =
    words.select(col("wcnt"), explode(expr(
      s"""flatten(transform(sequence(1, length(word)), i ->
         |  transform(sequence(i, least(i + ${maxPieceLen - 1}, length(word))),
         |            j -> substring(word, i, j - i + 1))))""".stripMargin))
        .as("piece"))
      .groupBy("piece").agg(sum(col("wcnt")).as("cnt"))

  /** Integer micro-nat log-probs from counts (one ln per piece). */
  private def quantize(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.values.sum.toDouble
    counts.map { case (p, c) =>
      p -> math.round(math.log(c / total) * 1e6)
    }
  }

  /** Viterbi segmentation maximizing the integer micro-nat score; ties
    * prefer the longer trailing piece. Single-char coverage makes every
    * word segmentable. */
  def viterbi(word: String, lp6: Map[String, Long]): Seq[String] = {
    val n = word.length
    val NEG = Long.MinValue / 4
    val best = Array.fill(n + 1)(NEG)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val maxL = math.min(maxPieceLen, i)
      while (l <= maxL) {
        if (best(i - l) > NEG) {
          lp6.get(word.substring(i - l, i)) match {
            case Some(p) =>
              val s = best(i - l) + p
              if (s > best(i) || (s == best(i) && l > back(i))) {
                best(i) = s; back(i) = l
              }
            case None =>
          }
        }
        l += 1
      }
      i += 1
    }
    if (best(n) <= NEG) return word.map(_.toString) // unreachable w/ char floor
    var j = n
    var acc: List[String] = Nil
    while (j > 0) { acc = word.substring(j - back(j), j) :: acc; j -= back(j) }
    acc
  }

  /** Train: seed → `iters` hard-EM rounds; returns the final
    * (piece, expected count, lp6) vocabulary, count-desc. */
  def train(docs: DataFrame, seedSize: Int, iters: Int): Seq[(String, Long, Long)] = {
    val spark = docs.sparkSession
    val words = Tokenizer.wordTable(docs).select("word", "wcnt").cache()
    try {
      // seed: top substrings by weighted count (deterministic tiebreak)
      // + every single char (coverage floor)
      val subs = substringCounts(words)
      val top = subs.where(length(col("piece")) >= 2)
        .orderBy(desc("cnt"), asc("piece")).limit(seedSize).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val chars = subs.where(length(col("piece")) === 1).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      var counts: Map[String, Long] = (top ++ chars).toMap
      val charSet = chars.map(_._1).toSet

      var it = 0
      while (it < iters) {
        val bc = spark.sparkContext.broadcast(quantize(counts))
        val seg = udf((w: String) => viterbi(w, bc.value))
        val used = words
          .select(col("wcnt"), explode(seg(col("word"))).as("piece"))
          .groupBy("piece").agg(sum(col("wcnt")).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        bc.destroy()
        // M-step: pieces the corpus used, plus a floor count for every
        // single char so coverage never collapses
        counts = used ++ charSet.filterNot(used.contains).map(_ -> 1L)
        it += 1
      }
      val lp = quantize(counts)
      counts.toSeq.sortBy { case (p, c) => (-c, p) }
        .map { case (p, c) => (p, c, lp(p)) }
    } finally words.unpersist(blocking = true)
  }

  /** Corpus Viterbi log-likelihood under a trained vocab — the hard-EM
    * objective (used by the monotonicity contract). */
  def corpusScore(docs: DataFrame, vocab: Seq[(String, Long, Long)]): Long = {
    val lp6 = vocab.map { case (p, _, l) => p -> l }.toMap
    val bc = docs.sparkSession.sparkContext.broadcast(lp6)
    val score = udf((w: String) =>
      viterbi(w, bc.value).map(bc.value).sum)
    Tokenizer.wordTable(docs)
      .select((score(col("word")) * col("wcnt")).as("s"))
      .agg(sum(col("s"))).head().getLong(0)
  }

  /** The trained vocabulary over the documents corpus. Iterative EM is
    * not SQL-expressible → rows-only; the paper-behavior contracts
    * (coverage, EM monotonicity, compression, partition invariance)
    * live in `TokenizerSpec`. */
  val q200UnigramTok: QueryDef = QueryDef.noOracle("q200_unigram_tok") { (s, d) =>
    import s.implicits._
    train(Tables.documents(s, d), seedSize = 200, iters = 2)
      .toDF("piece", "cnt", "lp6")
  }
}
