package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}

/** Fault injection for the retry-determinism gate (graft.RetryGate).
  *
  * A 1000-executor job over 100 TB WILL lose tasks, and Spark's
  * answer is re-execution — so "correct" includes "bit-identical
  * when any task runs twice". Every other correctness axis here is
  * gated (oracles, multi-JVM, skew, scale); this hook closes the
  * retry axis: [[failOnce]] makes every task of the stage it lands
  * in THROW on its first attempt and pass rows through untouched on
  * retries, so a run with injection exercises the
  * recompute-after-failure path end to end and must produce exactly
  * the clean run's bytes.
  *
  * Injection is an identity mapPartitions, deliberately: it cannot
  * change values, only fail attempts. It does pin the scan shape (no
  * pushdown through it), which is fine for a GATE — the graded
  * plans come from the clean path, and the comparison is
  * clean-vs-injected output equality.
  *
  * Wired behind the session conf `graft.chaos.failFirstAttempts`
  * (default off) read at plan-construction time in
  * [[graft.sources.Tables.load]], so the gate toggles it per run
  * without touching query code. Requires a master with task retries
  * (local[N,F] with F > 1, or any real cluster manager) — under
  * plain local[N] the first failure is fatal by design, which
  * RetrySpec uses to prove the injection actually fires.
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
}
