package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}

/** Fault injection for the retry-determinism gate (graft.RetryGate).
  *
  * A 1000-executor job over 100 TB WILL lose tasks, and Spark's
  * answer is re-execution — so "correct" includes "bit-identical
  * when any task runs twice". Every other correctness axis here is
  * gated (oracles, multi-JVM, skew, scale); these hooks close the
  * retry axis across its distinct failure modes:
  *
  *  - [[failOnce]] — every task of the stage it lands in THROWS on
  *    its first attempt and passes rows through untouched on retries
  *    (task-level retry; wired at the scans via [[maybeInject]], and
  *    wrapped around query OUTPUTS by RetryGate's reduce mode so the
  *    failure lands in the post-shuffle final stage).
  *  - [[fetchFailOnce]] — ONE task per stage throws a real
  *    `FetchFailedException` against one of the stage's own parent
  *    shuffles, which makes the DAGScheduler unregister map output and
  *    RESUBMIT the map stage: partial aggregation recomputes, rows
  *    arrive in a different order, and zombie first-attempt tasks
  *    race the reattempt — the whole-stage-recompute failure mode
  *    that task-level retry never exercises. Same-JVM masters only
  *    (local[N,F]): the poison bookkeeping and the shuffle-id
  *    lookup both live in this JVM.
  *  - [[slowFirst]] — one straggler per stage (partition 0 sleeps on
  *    its first attempt, value-neutral), for runs with
  *    `spark.speculation=true` under local-cluster: the speculative
  *    duplicate attempt races the original and the first to finish
  *    commits.
  *
  * All injectors are identity mapPartitions, deliberately: they
  * cannot change values, only fail/delay attempts. They do pin the
  * plan shape around them (no pushdown through), which is fine for a
  * GATE — the graded plans come from the clean path, and the
  * comparison is clean-vs-injected output equality.
  *
  * The scan hook is wired behind the session conf
  * `graft.chaos.failFirstAttempts` (default off) read at
  * plan-construction time in [[graft.sources.Tables.load]], so the
  * gate toggles it per run without touching query code. Requires a
  * master with task retries (local[N,F] with F > 1, or any real
  * cluster manager) — under plain local[N] the first failure is
  * fatal by design, which RetrySpec uses to prove the injection
  * actually fires.
  */
object Chaos {

  val ConfKey = "graft.chaos.failFirstAttempts"

  /** Identity passthrough that fails each task's first attempt. */
  def failOnce(df: DataFrame): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0)
        throw new RuntimeException(
          s"graft chaos: injected first-attempt failure " +
            s"(stage ${tc.stageId()}, partition ${tc.partitionId()})")
      it
    }(Encoders.row(df.schema))

  /** Apply [[failOnce]] iff the session opted in via [[ConfKey]]. */
  def maybeInject(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(ConfKey, "false").toBoolean) failOnce(df)
    else df

  /** Stages already poisoned by [[fetchFailOnce]] — one FetchFailed
    * per stage id, NOT per attempt: the resubmitted stage's tasks
    * start again at attemptNumber 0, so keying on attempt alone would
    * re-poison the reattempt forever (4 strikes aborts the stage).
    */
  private val poisonedStages =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** FetchFailed actually thrown (vs fallen back) — gate observability. */
  val fetchFailuresThrown = new AtomicLong(0)

  def resetFetchState(): Unit = {
    poisonedStages.clear()
    fetchFailuresThrown.set(0)
  }

  /** Identity passthrough where the first first-attempt task of each
    * stage reports a lost shuffle fetch (see object scaladoc). The
    * poisoned shuffle is one of the RUNNING STAGE'S OWN parents
    * (GraftChaosAccess) — the only ids guaranteed resolvable in the
    * DAGScheduler while the stage runs; naming any other id (e.g. the
    * query's most recent shuffle) crashes the scheduler's event loop
    * when AQE has already cleaned that id's materialization job.
    * Falls back to a plain injected failure when the stage reads no
    * shuffle (scan-only or broadcast-fed plans) — still a retry,
    * just task-level.
    *
    * BLAST RADIUS — single query per session only. The executor-JVM
    * branch deletes ALL shuffle_*.data/index files in that JVM's disk
    * block manager, not just the poisoned stage's (no executor-side
    * source of the current stage's shuffle ids is race-free, see the
    * inline note): under `local[*]` the one JVM holds EVERY job's
    * shuffle output, and on a shared executor any concurrent job's
    * in-flight shuffle dies with it. Each such job recovers through
    * the same FetchFailed → resubmit path, but the injection is no
    * longer the documented one-stage loss. RetryGate runs queries
    * strictly sequentially and asserts no other active jobs before
    * each fetch-mode wrap; any new caller must hold the same
    * discipline.
    */
  def fetchFailOnce(df: DataFrame): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 &&
          tc.stageAttemptNumber() == 0 &&
          !poisonedStages.contains(tc.stageId())) {
        val parents = org.apache.spark.scheduler.GraftChaosAccess
          .parentShuffleIds(tc.stageId())
        if (parents.nonEmpty) {
          // driver JVM (local master): the scheduler's own view
          if (poisonedStages.add(tc.stageId())) {
            val msg = s"graft chaos: injected fetch failure " +
              s"(stage ${tc.stageId()}, partition ${tc.partitionId()}, " +
              s"shuffles $parents)"
            fetchFailuresThrown.incrementAndGet()
            org.apache.spark.graft.ChaosShim
              .throwFetchFailed(parents.max, tc.partitionId(), msg)
          }
        } else if (poisonedStages.add(tc.stageId())) {
          // executor JVM (local-cluster / real cluster): no scheduler
          // here, and no race-free executor-side source of a
          // resolvable shuffle id exists (the worker tracker's status
          // cache fills during reader CONSTRUCTION, before this code
          // runs, and mixes ids whose scheduler registrations may be
          // cleaned — naming one kills the event loop, round 11's
          // crash). Inject the loss FOR REAL instead: delete this
          // executor's shuffle data/index files and throw the marked
          // task failure. Sibling tasks (and this task's retry) hit
          // the genuinely missing blocks, the real read path raises
          // FetchFailedException with the true coordinates, the
          // DAGScheduler unregisters this executor's map outputs and
          // RESUBMITS the map stage, which regenerates the files —
          // the full production recovery cascade, no constructed
          // exception. (Files of earlier shuffles die too; any later
          // AQE reuse of them recovers through the same path.)
          val n = org.apache.spark.graft.ChaosShim.deleteLocalShuffleData()
          fetchFailuresThrown.incrementAndGet()
          throw new RuntimeException(
            s"graft chaos: injected shuffle-data loss " +
              s"(stage ${tc.stageId()}, partition ${tc.partitionId()}, " +
              s"$n local shuffle files deleted)")
        }
      }
      it
    }(Encoders.row(df.schema))

  /** Identity passthrough where partition 0's first attempt sleeps —
    * a value-neutral straggler for speculation runs. Serializes
    * cleanly to remote executors (no shared state).
    */
  def slowFirst(df: DataFrame, sleepMs: Long = 4000L): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        Thread.sleep(sleepMs)
      it
    }(Encoders.row(df.schema))
}
