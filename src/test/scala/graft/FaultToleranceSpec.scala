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
  */
class FaultToleranceSpec extends SparkTestBase {

  test("injected shuffle-fetch failure recovers via stage resubmission") {
    val sc = spark.sparkContext
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
  }
}
