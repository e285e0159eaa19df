package graft

import org.apache.spark.sql.functions._
import graft.operators.{Tokenizer, UnigramTokenizer}

/** Ground-truth contract for distributed BPE training (q157 is
  * rows-only — the iterative argmax is not oracle-expressible): the
  * PUBLIC reference corpus from the BPE paper (Sennrich et al. 2016,
  * §3.2: low×5, lower×2, newest×6, widest×3) with merges hand-computed
  * below, plus the greedy-apply law and partition invariance.
  *
  * Hand derivation (counts are exact integer sums):
  *   initial pairs: (e,s)=9 (6 newest + 3 widest), (s,t)=9, (w,e)=8,
  *   (l,o)=7, (o,w)=7, (n,e)=6, (e,w)=6, (w,i)=3, (i,d)=3, (d,e)=3,
  *   (e,r)=2 → tie (e,s)/(s,t) broken lexicographically → merge 0 =
  *   (e,s). Then (es,t)=9 wins; then (l,o)=7 beats (o,w)=7 on the
  *   tiebreak; then (lo,w)=7; then the 6-tie (e,w)/(n,e)/(w,est)
  *   resolves to (e,w); then (ew,est)=6 ties (n,ew)=6 and 'ew' < 'n'.
  */
class TokenizerSpec extends SparkTestBase {
  import spark.implicits._

  private def paperCorpus = {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("BPE paper corpus: first six merges match the hand computation") {
    val merges = Tokenizer.bpeTrain(paperCorpus, numMerges = 6)
      .map { case (_, l, r, c) => (l, r, c) }
    assert(merges === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L),
      ("lo", "w", 7L), ("e", "w", 6L), ("ew", "est", 6L)))
  }

  test("greedy apply: a just-formed merge does not cascade (aaa -> [aa, a])") {
    val df = Seq("aaa", "aaaa", "aba").toDF("word")
      .withColumn("toks", Tokenizer.charSplit($"word"))
      .withColumn("merged", Tokenizer.applyMerge("toks", "a", "a"))
    val got = df.select("merged").collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(List("aa", "a"), List("aa", "aa"), List("a", "b", "a")))
  }

  test("training is invariant to partition count (exact integer argmax)") {
    val p1 = Tokenizer.bpeTrain(paperCorpus.repartition(1), 4)
    val p7 = Tokenizer.bpeTrain(paperCorpus.repartition(7), 4)
    assert(p1 === p7)
  }

  test("encode: held-out 'lowest' tokenizes to [low, est] — the canonical result") {
    val merges = Tokenizer.bpeTrain(paperCorpus, numMerges = 6)
    val words = Seq("lowest", "newer", "wide").toDF("word")
      .withColumn("toks", Tokenizer.charSplit($"word"))
    val got = Tokenizer.encodeWords(words, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("lowest") === List("low", "est"))
    // newer: (e,s)/(es,t) no-op; (l,o) no-op; (e,w) -> n ew e r
    assert(got("newer") === List("n", "ew", "e", "r"))
    assert(got("wide") === List("w", "i", "d", "e"))
  }

  test("encode stats: counts and compression are exact integers") {
    val stats = Tokenizer.bpeEncodeStats(paperCorpus, numMerges = 6)
      .orderBy("doc_id").collect()
    assert(stats.length === 16) // every doc has its one word
    val byWord = paperCorpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    stats.foreach { r =>
      val (id, nWords, nChars, nToks) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nWords === 1L)
      assert(nChars === byWord(id).length.toLong)
      // trained tokens: low->1, lower->3 (low,e,r), newest->2 (n,ewest —
      // merge 6 fuses ew+est), widest->4 (w,i,d,est)
      val expectToks = byWord(id) match {
        case "low" => 1L; case "lower" => 3L; case "newest" => 2L
        case "widest" => 4L
      }
      assert(nToks === expectToks, s"doc $id word ${byWord(id)}")
      assert(r.getLong(4) === nChars * 1000000L / nToks)
    }
  }

  test("merge exhaustion stops early instead of looping") {
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    // "ab" supports exactly one merge; asking for 5 must return 1.
    val merges = Tokenizer.bpeTrain(tiny, numMerges = 5)
    assert(merges === Seq((0, "a", "b", 1L)))
  }

  // ---- unigram-LM (SentencePiece) trainer, q200 -----------------------

  test("unigram: every word Viterbi-segments back to itself (coverage)") {
    val vocab = UnigramTokenizer.train(paperCorpus, seedSize = 50, iters = 2)
    val lp6 = vocab.map { case (p, _, l) => p -> l }.toMap
    for (w <- Seq("low", "lower", "newest", "widest", "zzzq")) {
      // zzzq: unseen chars fall back to the per-char path only if its
      // chars exist; use seen-alphabet words for the strict check
      if (w != "zzzq")
        assert(UnigramTokenizer.viterbi(w, lp6).mkString === w,
          s"segmentation of '$w' must concatenate back")
    }
    // single-char floor: the whole training alphabet is in the vocab
    val alphabet = "lowernstwid".toSet.map((c: Char) => c.toString)
    assert(alphabet.subsetOf(lp6.keySet))
  }

  test("unigram: hard-EM corpus score is monotonically non-decreasing") {
    val v1 = UnigramTokenizer.train(paperCorpus, seedSize = 50, iters = 1)
    val v2 = UnigramTokenizer.train(paperCorpus, seedSize = 50, iters = 2)
    val v3 = UnigramTokenizer.train(paperCorpus, seedSize = 50, iters = 3)
    val (s1, s2, s3) = (UnigramTokenizer.corpusScore(paperCorpus, v1),
      UnigramTokenizer.corpusScore(paperCorpus, v2),
      UnigramTokenizer.corpusScore(paperCorpus, v3))
    assert(s2 >= s1, s"EM must not worsen the objective: $s1 -> $s2")
    assert(s3 >= s2, s"EM must not worsen the objective: $s2 -> $s3")
  }

  test("unigram: learns multi-char pieces that compress the paper corpus") {
    val vocab = UnigramTokenizer.train(paperCorpus, seedSize = 50, iters = 2)
    val lp6 = vocab.map { case (p, _, l) => p -> l }.toMap
    // the shared 'est' suffix of newest/widest (9 of 16 words) must
    // survive EM as a used piece, and segmentations must beat chars
    val segs = Seq("newest", "widest").map(w => UnigramTokenizer.viterbi(w, lp6))
    assert(segs.forall(_.length < 6), s"no compression: $segs")
    assert(segs.forall(_.exists(_.length >= 2)), "multi-char pieces unused")
    // pieces reported with positive expected counts only
    assert(vocab.forall(_._2 > 0))
  }

  test("unigram: training is invariant to partition count") {
    val a = UnigramTokenizer.train(paperCorpus.repartition(1), 50, 2)
    val b = UnigramTokenizer.train(paperCorpus.repartition(13), 50, 2)
    assert(a === b, "vocab must be bit-identical at any partitioning")
  }

  test("q200 runs: vocabulary is deterministic, count-ordered, finite") {
    val df = SparkEntry.queries("q200_unigram_tok")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 200 + 26)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y },
      "must be count-descending")
    assert(rows.forall(_.getLong(2) < 0), "log-probs are negative micro-nats")
  }
}
