package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerSpeculativeTaskSubmitted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
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
  * distributed-correctness axis those gates cannot see.
  *
  * Four injection modes (`SPARK_GRAFT_RETRY_MODE`), one per
  * re-execution failure mode a real cluster has:
  *
  *  - `scan` (default) — a first-attempt failure in EVERY task of
  *    every scan stage ([[Chaos.failOnce]] behind the session conf,
  *    wired in Tables.load): map-side task retry.
  *  - `reduce` — the query's OUTPUT is wrapped in [[Chaos.failOnce]],
  *    so the failure lands in the final (post-shuffle, for any
  *    shuffling query) stage: reduce-side task retry, which re-reads
  *    shuffle data and re-merges partial aggregates.
  *  - `fetch` — one task of each output stage throws a real
  *    FetchFailedException ([[Chaos.fetchFailOnce]]) against the
  *    job's most recent shuffle: the DAGScheduler unregisters map
  *    output and RESUBMITS the map stage, so partials recompute in a
  *    different order and zombie first-attempt tasks race the
  *    reattempt — whole-stage recompute, not just task retry.
  *  - `spec` — `spark.speculation=true` under local-cluster with a
  *    value-neutral straggler ([[Chaos.slowFirst]]): the scheduler
  *    marks the straggler speculatable (speculatable_marked counts
  *    it). On a multi-host cluster the duplicate attempt then races
  *    the original and exactly one commits; this sandbox is ONE host,
  *    and Spark never places a speculative copy on a host that
  *    already runs an attempt, so the copy is marked but unlaunched
  *    here — the concurrent-duplicate-attempt race itself is
  *    exercised by `fetch` mode's zombie tasksets (the poisoned
  *    stage's surviving first-attempt tasks keep running while the
  *    reattempt recomputes the same partitions).
  *
  * Runs under `local[32,4]` (the ",4" = spark.task.maxFailures — a
  * plain local[N] master treats the first failure as fatal, which is
  * also why this is a standalone main and not a spec in the shared
  * local[32] test session; RetrySpec covers the mechanics there).
  * `spec` mode defaults to `local-cluster[2,16,4096]` because
  * speculation needs a scheduler with more than one executor.
  *
  * The default slice leans on the families where retry bugs would
  * live: sequential per-key recurrences (q_ema), iterated
  * driver-coordinated loops (q_bpe_train), order-sensitive
  * aggregations (q_top_paths, q_epoch_shuffle), store-appending
  * incremental paths whose idempotence probe must also hold under
  * re-execution (q_dedup_cluster_incr, q_dsir_incr), plus
  * bread-and-butter aggregates/windows/banding as controls.
  *
  * Prints one JSON line: per-query "match"/"mismatch"/error, the
  * number of injected task failures observed — counted ONLY when the
  * failure reason carries the "graft chaos" marker, so genuine
  * environmental failures (OOM, executor loss) can never masquerade
  * as proof the gate exercised injection; those are reported
  * separately as other_task_failures — plus speculative-attempt and
  * FetchFailed counters for the modes that produce them.
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
    val mode = sys.env.getOrElse("SPARK_GRAFT_RETRY_MODE", "scan")
    require(Set("scan", "reduce", "fetch", "spec")(mode),
      s"unknown SPARK_GRAFT_RETRY_MODE=$mode")
    val defaultMaster =
      if (mode == "spec") "local-cluster[2,16,4096]" else "local[32,4]"
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", defaultMaster)
    val builder = SparkSession.builder()
      .appName(s"graft-retry-gate-$mode")
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // fetch mode names the driver's own block manager as the lost
      // fetch location, and the DAGScheduler responds by unregistering
      // that block manager ("executor lost"). A LOCAL master can never
      // re-register it: BlockManagerMasterEndpoint.register's
      // isExecutorAlive probe asks the CoarseGrainedScheduler RPC
      // endpoint, which only cluster backends register — so any task
      // whose result is too big for the inline path (1 MB
      // maxDirectResultSize default) is stored in the unregistered
      // block manager and dies as TaskResultLost, 4 of which abort the
      // job (measured at sf0.1; sf0.01 passed only because every task
      // result fit inline). Routing results inline keeps the gate
      // testing what it is FOR — shuffle recompute determinism — not
      // local mode's unrecoverable block-manager re-registration.
      .config("spark.task.maxDirectResultSize", "100m")
      .config("spark.rpc.message.maxSize", "256")
    if (master.startsWith("local-cluster")) {
      // executors are separate JVMs: ship our classes + module opens
      builder
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions",
          Seq("java.base/java.lang", "java.base/java.lang.invoke",
            "java.base/java.lang.reflect", "java.base/java.io",
            "java.base/java.net", "java.base/java.nio",
            "java.base/java.util", "java.base/java.util.concurrent",
            "java.base/java.util.concurrent.atomic",
            "java.base/jdk.internal.ref", "java.base/sun.nio.ch",
            "java.base/sun.nio.cs", "java.base/sun.security.action",
            "java.base/sun.util.calendar")
            .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" "))
    }
    if (mode == "spec") {
      builder
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "50ms")
        .config("spark.speculation.quantile", "0.4")
        .config("spark.speculation.multiplier", "1.2")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOG_LEVEL", "ERROR"))
    val injectedFailures = new AtomicLong
    val otherFailures = new AtomicLong
    val speculativeTasks = new AtomicLong
    val speculationKills = new AtomicLong
    val otherKills = new AtomicLong
    val resubmittedStages = new AtomicLong
    val speculatableMarked = new AtomicLong
    val injectedFetchFails = new AtomicLong
    val unmarkedFetchFails = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onSpeculativeTaskSubmitted(
          e: SparkListenerSpeculativeTaskSubmitted): Unit =
        // the scheduler decided a duplicate attempt is warranted —
        // proof spec mode's straggler engaged speculation. On a
        // single-host sandbox the copy is marked but never PLACED
        // (Spark refuses same-host speculative placement by design),
        // so this counter, not speculative_tasks, is the engagement
        // signal here; on any multi-host cluster the same run would
        // also launch and race the copy.
        speculatableMarked.incrementAndGet()
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        // attempt > 0 = the DAGScheduler re-ran a whole stage — the
        // proof fetch mode exercised stage resubmission, not just
        // task retry
        if (e.stageInfo.attemptNumber() > 0)
          resubmittedStages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = e.reason match {
        case org.apache.spark.Success =>
          if (e.taskInfo != null && e.taskInfo.speculative)
            speculativeTasks.incrementAndGet()
        case k: org.apache.spark.TaskKilled =>
          // count ONLY speculation's loser attempts; fetch mode also
          // produces TaskKilled (zombie tasks of a resubmitted stage
          // killed at stage/job completion) and those must not read
          // as speculation evidence
          if (k.reason.contains("another attempt succeeded"))
            speculationKills.incrementAndGet()
          else otherKills.incrementAndGet()
        case f: org.apache.spark.FetchFailed =>
          // the driver-visible proof a REAL FetchFailed reached the
          // scheduler — the evidence that works when the injection
          // happens in an executor JVM (Chaos.fetchFailuresThrown is
          // a per-JVM counter the driver cannot read under
          // local-cluster). Marked = the driver-path constructed
          // exception; unmarked = the genuine read-path failures
          // sibling tasks hit after injected shuffle-data loss — a
          // downstream effect of injection in FETCH mode only, so it
          // doesn't land in other_task_failures there. Unmarked
          // FetchFailed counts separately so scan/reduce/spec modes
          // — where NO shuffle data is deleted — can assert it zero:
          // a disk fault or real network loss during those runs must
          // trip the misattribution guard, not hide as
          // injection-downstream (r12 advisor).
          injectedFetchFails.incrementAndGet()
          if (f.toErrorString.contains("graft chaos"))
            injectedFailures.incrementAndGet()
          else unmarkedFetchFails.incrementAndGet()
        case r: org.apache.spark.TaskFailedReason =>
          if (r.toErrorString.contains("graft chaos"))
            injectedFailures.incrementAndGet()
          else otherFailures.incrementAndGet()
        case _ => otherFailures.incrementAndGet()
      }
    })
    val keys = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some("ALL") => SparkEntry.queries.keys.toSeq.sorted
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => DefaultKeys
    }
    // crash-resume for hours-scale big-SF runs (the Verify
    // SPARK_GRAFT_RESUME discipline): verdicts append to the ckpt
    // file as they land; keys already recorded there are skipped on
    // relaunch and their recorded verdicts fold into the final JSON.
    // A record is terminal ONLY when (a) its stamp matches this
    // run's (mode, sf, master) — a scan-mode ckpt must not vacuously
    // pass a fetch-mode run — and (b) the verdict is a match:
    // error/mismatch verdicts re-run on resume (a transient OOM must
    // not become permanent).
    val ckptPath = sys.env.get("SPARK_GRAFT_RETRY_CKPT")
    val stamp = s"$mode|$sfDir|$master"
    val recorded: Map[String, String] = ckptPath
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      .map { p =>
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p)))
          .asScala.map(_.split("\t", 3)).collect {
            case Array(k, s, v) if s == stamp && v.startsWith("match:") =>
              k -> v
          }.toMap
      }.getOrElse(Map.empty)
    def record(k: String, v: String): Unit = ckptPath.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        s"$k\t$stamp\t$v\n", java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    val fetchThrownTotal = new AtomicLong
    val results = keys.map { k =>
      val fn = SparkEntry.queries(k)
      if (recorded.contains(k)) {
        println(s"[retry-gate] $k -> ${recorded(k)} (resumed)")
        k -> recorded(k)
      } else {
      val verdict = try {
        spark.conf.set(Chaos.ConfKey, "false")
        val clean = canon(fn(spark, sfDir))
        Chaos.resetFetchState() // only this query's job may be poisoned
        val injected = mode match {
          case "scan" =>
            spark.conf.set(Chaos.ConfKey, "true")
            canon(fn(spark, sfDir))
          case "reduce" => canon(Chaos.failOnce(fn(spark, sfDir)))
          case "fetch" =>
            // fetch injection deletes the executor JVM's WHOLE shuffle
            // dir (Chaos.fetchFailOnce scaladoc): enforce the one-job-
            // at-a-time precondition instead of assuming it
            val active = spark.sparkContext.statusTracker.getActiveJobIds()
            require(active.isEmpty,
              s"fetch-mode chaos with concurrent active jobs ${active.toSeq}: " +
                "the shuffle-data deletion would widen past one query")
            canon(Chaos.fetchFailOnce(fn(spark, sfDir)))
          // repartition first: the straggler needs completed sibling
          // tasks in ITS OWN stage for the speculation median, and AQE
          // often coalesces a small query's final stage to one task
          case "spec"   => canon(Chaos.slowFirst(fn(spark, sfDir).repartition(8)))
        }
        fetchThrownTotal.addAndGet(Chaos.fetchFailuresThrown.get())
        if (java.util.Arrays.equals(
            clean.asInstanceOf[Array[AnyRef]],
            injected.asInstanceOf[Array[AnyRef]]))
          s"match:${clean.length}"
        else {
          // -1 from indexWhere + differing lengths = the diff is the
          // extra trailing rows; report the divergence point (the
          // shorter length), not a bewildering at=-1.
          val zipDiff = clean.zip(injected).indexWhere { case (a, b) => a != b }
          val firstDiff =
            if (zipDiff >= 0) zipDiff
            else math.min(clean.length, injected.length)
          s"mismatch:rows=${clean.length}/${injected.length}:at=$firstDiff"
        }
      } catch {
        case e: Throwable =>
          s"error:${e.getClass.getSimpleName}:${Option(e.getMessage).getOrElse("").take(120)}"
      } finally spark.conf.set(Chaos.ConfKey, "false")
      println(s"[retry-gate] $k -> $verdict")
      record(k, verdict)
      k -> verdict
      }
    }
    val qJson = results
      .map { case (k, v) => s""""$k":"${v.replace("\"", "'")}"""" }
      .mkString(",")
    val allMatch = results.forall(_._2.startsWith("match:"))
    // only fetch mode deletes shuffle data; any genuine FetchFailed in
    // the other modes is environmental and fails the gate outright
    val unmarkedFetchOk = mode == "fetch" || unmarkedFetchFails.get() == 0L
    println(s"""{"metric":"retry_gate","mode":"$mode","all_match":$allMatch,""" +
      s""""injected_task_failures":${injectedFailures.get()},""" +
      s""""other_task_failures":${otherFailures.get()},""" +
      s""""fetch_failures_thrown":${fetchThrownTotal.get()},""" +
      s""""fetch_failed_task_ends":${injectedFetchFails.get()},""" +
      s""""fetch_failed_unmarked":${unmarkedFetchFails.get()},""" +
      s""""unmarked_fetch_ok":$unmarkedFetchOk,""" +
      s""""resubmitted_stages":${resubmittedStages.get()},""" +
      s""""speculatable_marked":${speculatableMarked.get()},""" +
      s""""speculative_tasks":${speculativeTasks.get()},""" +
      s""""speculation_kills":${speculationKills.get()},""" +
      s""""other_task_kills":${otherKills.get()},""" +
      s""""master":"${spark.sparkContext.master}","sf":"$sfDir",""" +
      s""""queries":{$qJson}}""")
    spark.stop()
    if (!allMatch || !unmarkedFetchOk) sys.exit(1)
  }
}
