package org.apache.spark.graft

import org.apache.spark.SparkEnv
import org.apache.spark.shuffle.FetchFailedException

/** Gate-only access to the `private[spark]` FetchFailedException
  * constructor, so graft.Chaos can report a lost shuffle fetch the
  * way a real executor does.
  *
  * Why it must be the real exception: the Executor special-cases
  * FetchFailedException (its constructor registers itself on the
  * running TaskContext), and the DAGScheduler's FetchFailed handling
  * is the code path under test — unregister the map output, resubmit
  * the map stage, recompute partials, let zombie attempts race the
  * reattempt. A plain RuntimeException only exercises task-level
  * retry. Like [[BusFlush]], this is a measurement shim for
  * graft.RetryGate, not a production dependency.
  */
object ChaosShim {

  /** Throw a FetchFailedException naming this JVM's block manager as
    * the lost location. `shuffleId` must be registered with the
    * running job (graft.Chaos.lastShuffleId guarantees it): the
    * DAGScheduler resolves it via `shuffleIdToMapStage(shuffleId)`
    * and an unknown id would kill the event loop, not the task.
    */
  def throwFetchFailed(shuffleId: Int, reduceId: Int, msg: String): Nothing =
    throw new FetchFailedException(
      SparkEnv.get.blockManager.blockManagerId,
      shuffleId, 0L, 0, reduceId, msg)
}
