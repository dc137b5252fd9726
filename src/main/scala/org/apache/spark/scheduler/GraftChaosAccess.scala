package org.apache.spark.scheduler

import scala.util.Try

import org.apache.spark.SparkContext

/** Gate-only, driver-JVM-only view of a running stage's shuffle
  * parents, for graft.Chaos's FetchFailed injection.
  *
  * Why this exists: a FetchFailedException must name a shuffle the
  * DAGScheduler can resolve via `shuffleIdToMapStage` — and under AQE
  * a query runs as MANY jobs, each of which cleans its own stages
  * (including their shuffleIdToMapStage entries) on completion, so
  * "the most recent shuffle id this query registered" can be a
  * cleaned id by the time the final stage's task throws. Naming one
  * crashes the DAGScheduler event loop (key-not-found inside
  * handleTaskCompletion), killing the SparkContext — the round-11
  * fetch gate died exactly this way on q_containment_recall's
  * broadcast-heavy final stage. The only ids that are GUARANTEED
  * resolvable while a stage runs are that stage's own shuffle
  * parents: the running job owns them, and getOrCreateShuffleMapStage
  * re-registered them when the job was submitted. This accessor
  * returns exactly those, straight from the scheduler's structures.
  *
  * `private[scheduler]` members force the package; local masters
  * only (task and driver share the JVM) — which is the chaos gate's
  * documented regime. Reads of the scheduler's mutable maps from a
  * task thread are racy in general; the Try keeps any transient
  * inconsistency a fallback (plain task retry), never a crash.
  */
object GraftChaosAccess {

  /** Shuffle ids the given stage directly reads (its parent
    * ShuffleMapStages), or empty when the stage has none (scan-only /
    * broadcast-fed result stages) or the lookup races a concurrent
    * scheduler mutation.
    */
  def parentShuffleIds(stageId: Int): Seq[Int] =
    Try {
      SparkContext.getActive.toSeq.flatMap { sc =>
        sc.dagScheduler.stageIdToStage.get(stageId).toSeq.flatMap { st =>
          st.parents.collect {
            case m: ShuffleMapStage => m.shuffleDep.shuffleId
          }
        }
      }
    }.getOrElse(Seq.empty)
}
