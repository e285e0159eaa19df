package graft

import org.apache.spark.sql.functions._

/** Contracts for the Lee-et-al maximal duplicated-span detector
  * (q215): a planted cross-document duplicate at DIFFERENT offsets
  * (the alignment case a strided shingle would miss) is found with
  * exact boundaries and merged into one maximal span; unique text
  * yields nothing; adjacent self-repetition merges into one span. */
class DupSpansSpec extends SparkTestBase {
  import spark.implicits._

  /** Collision-free uppercase filler: the seed·j term makes any two
    * seeds' sequences differ at a k-varying phase, so no 50-char
    * window repeats within or across fillers (brute-force verified
    * over all fixtures below). Alphabet disjoint from the planted
    * lowercase+digit duplicate, so boundary-crossing windows can never
    * coincide with in-duplicate windows. */
  private def ap(seed: Int, n: Int): String =
    (0 until n).map(j =>
      ('A' + ((seed * 31 + j * 7 + (j / 5) * 11 + seed * j) % 26)).toChar)
      .mkString

  private def run(rows: Seq[(Long, String)]) = {
    val docs = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("dupspans").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    SparkEntry.queries("q215_dup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
  }

  test("a planted 100-char cross-doc duplicate at misaligned offsets -> one exact maximal span") {
    val dup = (1 to 10).map(k => f"block$k%04d!").mkString // 100 chars
    assert(dup.length === 100)
    val d0 = ap(0, 37) + dup + ap(1, 40) // dup occupies [38, 137]
    val d1 = ap(2, 73) + dup + ap(3, 21) // dup occupies [74, 173] — offset differs mod any stride
    val d2 = ap(4, 90)                   // unique filler doc
    val got = run(Seq((0L, d0), (1L, d1), (2L, d2)))
    assert(got.map(_._1) === Seq(0L, 1L), "only the two planted docs report spans")
    got.foreach { case (_, n, chars, maxSpan) =>
      assert(n === 1L, "overlapping window hits merge into ONE maximal span")
      assert(chars === 100L, "per-char windows recover the exact 100-char boundary")
      assert(maxSpan === 100L)
    }
  }

  test("a corpus of unique documents yields no duplicated spans") {
    val rows = (0 until 8).map(i => (i.toLong, ap(i, 90)))
    assert(run(rows).isEmpty)
  }

  test("adjacent self-repetition inside one document merges to one span (Lee et al. self-dup case)") {
    val unit = (1 to 6).map(k => f"rep$k%05d.").mkString // 54 chars
    val doc = ap(5, 25) + unit + unit + ap(6, 30) // unit repeats back-to-back at [26, 133]
    val got = run(Seq((0L, doc)))
    assert(got.nonEmpty, "two occurrences of a 54-char unit inside one doc must flag")
    val (_, n, chars, _) = got.head
    // flagged windows are {26..30} and the period-54 mirror {80..84};
    // the first island reaches 30+49 = 79, so 80 is ADJACENT and the
    // merge yields one island [26, 133]
    assert(n === 1L, "the two repeats produce one contiguous island")
    assert(chars === 108L, "island spans the doubled region reachable by full windows")
  }
}
