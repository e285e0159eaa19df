package graft

/** Failure recovery ≙ the reference's fault-inject suite
  * (`/root/reference/tests/fullstack-test/fault-inject/`): a segment
  * read that dies mid-query must be retried, not fail the query. The
  * Spark-native form of that contract is lineage-based recovery: a
  * reduce task that hits a shuffle-fetch failure reports the lost map
  * output, the scheduler resubmits the map stage, and the job still
  * returns the correct answer. This test injects a real
  * FetchFailedException (the exact signal a dead executor produces) on
  * the first attempt of one reduce partition and asserts exact results.
  *
  * QUARANTINED SESSION (r18, the r17 `sbt test` red-tail attribution):
  * the injected FetchFailed makes the scheduler mark the local
  * "executor" lost, after which the shared session's BlockManager
  * re-registration loop asks a `CoarseGrainedScheduler` RPC endpoint
  * that never exists in local mode — an `ERROR Inbox: Ignoring error`
  * + RpcEndpointNotFoundException stack trace EVERY 20 SECONDS for the
  * remaining ~25 minutes of the suite run (203 traces in one full run).
  * The spam drowned the real tail of every test log (VERIFY_r17's
  * `test_tail` was exactly this trace, unattributable to any suite).
  * Running the injection in its own SparkContext and stopping it
  * afterwards confines the damage to this suite; the next suite's
  * getOrCreate builds a fresh, healthy session. */
class FaultToleranceSpec extends SparkTestBase {

  test("injected shuffle-fetch failure recovers via stage resubmission") {
    // tear down the shared session so the fault runs in — and its
    // lingering re-registration state dies with — a private context
    GraftSession.builder("local[4]", 4).getOrCreate().stop()
    val own = GraftSession.builder("local[4]", 4).getOrCreate()
    try {
      val sc = own.sparkContext
      val base = sc.parallelize(1L to 100000L, 8).map(i => (i % 97, i))
      val shuffled = base.reduceByKey(_ + _, 8)
      val shuffleId = shuffled.dependencies.head
        .asInstanceOf[org.apache.spark.ShuffleDependency[_, _, _]].shuffleId
      val bm = org.apache.spark.SparkEnv.get.blockManager.blockManagerId
      val withFault = shuffled.mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc.partitionId() == 0 && tc.stageAttemptNumber() == 0)
          throw org.apache.spark.graftshim.FaultShim.fetchFailed(
            bm, shuffleId, 0L, 0, tc.partitionId(), "injected segment-read fault")
        it
      }
      val result = withFault.collect().toMap
      val expected = (1L to 100000L).groupBy(_ % 97).map { case (k, v) => k -> v.sum }
      assert(result === expected,
        "query must survive a shuffle-fetch failure with exact results")
    } finally own.stop()
  }
}
