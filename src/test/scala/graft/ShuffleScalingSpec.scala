package graft

import org.apache.spark.sql.functions._

/** Fine-grained-shuffle analog (≙ the reference's
  * `docs/design/2022-06-14-fine-grained-shuffle.md:91-99`: windowed
  * queries scale ~linearly with the shuffle stream count): the same
  * partitioned window query must produce identical results at any
  * shuffle partition count, and raising the count from 2 to 32 must not
  * regress wall time (generous 3× + constant bound — this is a
  * correctness-of-scaling assertion, not a microbenchmark). */
class ShuffleScalingSpec extends SparkTestBase {

  test("partitioned window agg is partition-count invariant and does not regress at higher counts") {
    val sfDir = "/root/testdata/sf0.01"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    def runAt(n: Int): (Long, java.math.BigDecimal) = {
      spark.conf.set("spark.sql.shuffle.partitions", n)
      val df = operators.Windows.q43RowsFrame.fn(spark, sfDir)
      val chk = sum(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("decimal(38,0)"))
      val t0 = System.nanoTime()
      val v = df.agg(chk).first().getDecimal(0)
      ((System.nanoTime() - t0) / 1000000L, v)
    }
    try {
      // AQE would coalesce the small shuffle back down and erase the
      // difference under test
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      runAt(2); runAt(32) // JIT/codegen warmup
      val (t2, c2) = runAt(2)
      val (t32, c32) = runAt(32)
      assert(c2 == c32, "window result changed with shuffle partition count")
      assert(t32 <= t2 * 3 + 1000,
        s"32-partition run ($t32 ms) regressed vs 2-partition run ($t2 ms)")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }
}
