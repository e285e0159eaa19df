package org.apache.spark.graftshim

import org.apache.spark.shuffle.FetchFailedException
import org.apache.spark.storage.BlockManagerId

/** Test-only bridge to the `private[spark]` FetchFailedException
  * constructor, so `graft.FaultToleranceSpec` can inject a realistic
  * shuffle-fetch failure (the recovery path the reference exercises
  * with its fault-inject suite). Lives in test sources only.
  */
object FaultShim {
  def fetchFailed(bm: BlockManagerId, shuffleId: Int, mapTaskId: Long,
      mapIndex: Int, reduceId: Int, msg: String): Exception =
    new FetchFailedException(bm, shuffleId, mapTaskId, mapIndex, reduceId, msg)
}
