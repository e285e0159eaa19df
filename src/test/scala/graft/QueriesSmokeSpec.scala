package graft

/** Every declared query runs and yields a sane result at sf0.001 —
  * the per-operator smoke layer; exact-value checking is the driver's
  * DuckDB oracle (tools/check_oracle.py locally). */
class QueriesSmokeSpec extends SparkTestBase {

  // q9/q54 can legitimately be small; everything else must be non-empty.
  private val mayBeEmpty = Set("q9_join_anti", "q54_embed_neardup", "q61_dedup_minhash")

  SparkEntry.defs.foreach { q =>
    test(s"${q.name} runs non-empty with distinct column names") {
      val df = q.fn(spark, sf)
      val cols = df.columns
      assert(cols.nonEmpty && cols.distinct.length == cols.length,
        s"duplicate/empty columns: ${cols.mkString(",")}")
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
