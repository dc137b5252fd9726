package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Retry-determinism gate: every query must produce BIT-IDENTICAL
  * output when tasks fail and re-execute.
  *
  * Why a separate main: the correctness gates to date (oracle
  * compares at five SFs, two Zipf-skew sets, multi-JVM) all ran
  * failure-free, but a 1000-executor 100 TB job loses tasks as a
  * matter of course and Spark recomputes them — nondeterminism under
  * retry (an order-dependent accumulation, a stateful expression
  * seeded per attempt, a non-idempotent store append) is the one
  * distributed-correctness axis those gates cannot see. This gate
  * injects a first-attempt failure into EVERY task of every scan
  * stage ([[Chaos.failOnce]] behind the session conf, wired in
  * Tables.load) and diffs the output against the clean run,
  * row-sorted, value-exact.
  *
  * Runs under `local[32,4]` (the ",4" = spark.task.maxFailures — a
  * plain local[N] master treats the first failure as fatal, which is
  * also why this is a standalone main and not a spec in the shared
  * local[32] test session; RetrySpec covers the mechanics there).
  * The default slice leans on the families where retry bugs would
  * live: sequential per-key recurrences (q_ema), iterated
  * driver-coordinated loops (q_bpe_train), order-sensitive
  * aggregations (q_top_paths, q_epoch_shuffle), store-appending
  * incremental paths whose idempotence probe must also hold under
  * re-execution (q_dedup_cluster_incr, q_dsir_incr), plus
  * bread-and-butter aggregates/windows/banding as controls.
  *
  * Prints one JSON line: per-query "match"/"mismatch"/error, the
  * number of injected task failures observed (proof the gate
  * exercised retries, not a no-op), and rows compared.
  */
object RetryGate {

  private val DefaultKeys = Seq(
    "q1_agg", "q_candle_minute", "q_ema", "q_sessionize",
    "q_window_funcs", "q_bpe_train", "q_top_paths", "q_epoch_shuffle",
    "q_dedup_minhash", "q_dedup_cluster_incr", "q_dsir_incr",
    "q_containment_scale")

  /** Row-sorted canonical form; Row.toString prints every value, so
    * equality here is value-exact including array contents.
    */
  private def canon(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-retry-gate")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32,4]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val injectedFailures = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.reason != org.apache.spark.Success) injectedFailures.incrementAndGet()
    })
    val keys = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultKeys)
    val results = keys.map { k =>
      val fn = SparkEntry.queries(k)
      val verdict = try {
        spark.conf.set(Chaos.ConfKey, "false")
        val clean = canon(fn(spark, sfDir))
        spark.conf.set(Chaos.ConfKey, "true")
        val injected = canon(fn(spark, sfDir))
        if (java.util.Arrays.equals(
            clean.asInstanceOf[Array[AnyRef]],
            injected.asInstanceOf[Array[AnyRef]]))
          s"match:${clean.length}"
        else {
          val firstDiff = clean.zip(injected).indexWhere { case (a, b) => a != b }
          s"mismatch:rows=${clean.length}/${injected.length}:at=$firstDiff"
        }
      } catch {
        case e: Throwable =>
          s"error:${e.getClass.getSimpleName}:${Option(e.getMessage).getOrElse("").take(120)}"
      } finally spark.conf.set(Chaos.ConfKey, "false")
      println(s"[retry-gate] $k -> $verdict")
      k -> verdict
    }
    val qJson = results
      .map { case (k, v) => s""""$k":"${v.replace("\"", "'")}"""" }
      .mkString(",")
    val allMatch = results.forall(_._2.startsWith("match:"))
    println(s"""{"metric":"retry_gate","all_match":$allMatch,""" +
      s""""injected_task_failures":${injectedFailures.get()},""" +
      s""""master":"${spark.sparkContext.master}","sf":"$sfDir",""" +
      s""""queries":{$qJson}}""")
    spark.stop()
    if (!allMatch) sys.exit(1)
  }
}
