package graft

/** Partition-count invariance — the property that makes the
  * correctness gate meaningful at any cluster size (README "Scale
  * posture"): every query must produce the IDENTICAL result multiset
  * at shuffle.partitions = 7 and 32. Catches order-dependent float
  * summation, nondeterministic tie-breaks, and partition-id leakage
  * (the failure class the reference guards with its deterministic
  * merge trees). Mergeable-sketch queries are excluded: their outputs
  * are correct within documented error bounds but are legitimately
  * merge-order-dependent (space-saving topK, quantile sketch).
  */
class DeterminismSpec extends SparkTestBase {

  private val sketchBased = Set(
    "q137_approx_topk",       // Misra-Gries merge is order-sensitive
    "q116_approx_percentile", // quantile sketch merge is order-sensitive
    "q20_approx_distinct")    // HLL (commutative in practice; excluded as a sketch)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  SparkEntry.defs.filterNot(q => sketchBased(q.name)).foreach { q =>
    test(s"${q.name} is invariant to shuffle partition count") {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val a = canon(q.fn(spark, sf))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        val b = canon(q.fn(spark, sf))
        assert(a === b,
          s"${q.name} differs between 7 and 32 shuffle partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
