package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.TransactionSimulator

/** Streaming STATE-SCALE bench — the missing axis of StreamBench.
  *
  * Every stateful candle workload (and the reference's Kafka Streams
  * topology, stream/CandlestickAggregator.kt:75-118) runs at 5-symbol
  * key cardinality, where the state store is trivially small. A
  * user-grain 100 TB stream holds MILLIONS of state keys; what decides
  * viability there is (a) whether throughput survives the per-key
  * state traffic and (b) whether watermark eviction actually bounds
  * state growth, batch over batch, instead of the store accreting one
  * row per key·window forever.
  *
  * This main measures both, on a deterministic `rate-micro-batch`
  * user-grain source (TransactionSimulator.userStreamMicroBatch:
  * user_id = tick mod K, event time a pure function of tick id — so
  * watermarks march identically on any machine), for each requested
  * key cardinality × state-store provider:
  *
  *   - workload `window_agg`: watermark 30s → groupBy(1-minute
  *     window, user_id) count/sum — the canonical windowed-agg state
  *     shape: live rows ≈ K × windows-in-flight, closed windows must
  *     be EVICTED on watermark advance.
  *   - workload `session`: watermark 30s → session_window(ts, 30s)
  *     per user — sessionization at user grain (the LLM-pipeline
  *     analog: per-user event sessions), merge-heavy state traffic.
  *
  * Providers: `hdfs` (HDFSBackedStateStoreProvider, in-heap),
  * `rocksdb` (RocksDBStateStoreProvider — the off-heap regime every
  * large-cardinality production stream runs, stock settings), and
  * `rocksdb_tuned` (same provider + the three documented knobs a
  * production deployment flips first: changelog checkpointing —
  * commit uploads the per-batch delta instead of full SST files;
  * trackTotalNumberOfRows=false — row-count maintenance costs one
  * extra get per put, and at high key cardinality puts dominate;
  * blockCacheSizeMB 8→512 — the stock 8 MB cache thrashes once the
  * hot key set outgrows it. numRowsTotal reads 0 with tracking off,
  * so the eviction-plateau series comes from the STOCK rocksdb run;
  * the tuned run measures throughput recovery), and `rocksdb_bounded`
  * (the tuned knobs + boundedMemoryUsage with a 1 GB
  * maxMemoryUsageMB — one shared cache/write-buffer budget across
  * all store instances, the fleet-wide ceiling a production cluster
  * sets; the A/B says what the cap costs). Same workload, same
  * data, provider config is the only variable.
  *
  * Per run it reports events/sec (Σ rows / Σ triggerExecution over
  * the measured batches, warmup discarded) plus the state operator's
  * own numbers from StreamingQueryProgress: max/last numRowsTotal,
  * Σ numRowsRemoved, and the per-batch numRowsTotal series — the
  * direct evidence that eviction holds the plateau (state rows stay
  * ≈ K × windows-in-flight, independent of batch count).
  *
  * Env knobs: SPARK_GRAFT_STATE_KEYS (comma list, default
  * "10000,100000,1000000"), SPARK_GRAFT_STREAM_TICKS (ticks/batch,
  * default 2000000), SPARK_GRAFT_STATE_PROVIDERS (default
  * "hdfs,rocksdb"), SPARK_GRAFT_STATE_WORKLOADS (default
  * "window_agg,session").
  *
  * Prints ONE JSON line:
  *   {"metric":"stream_state_scale","ticks_per_batch":N,"runs":[
  *    {"workload":…,"provider":…,"keys":K,"events_per_sec":…,
  *     "batches":…,"state_rows_max":…,"state_rows_last":…,
  *     "state_rows_removed":…,"state_mem_mb":…,
  *     "state_rows_series":[…]},…]}
  */
object StateBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ticks = sys.env.getOrElse("SPARK_GRAFT_STREAM_TICKS", "2000000").toLong
    val keyList = sys.env.getOrElse("SPARK_GRAFT_STATE_KEYS",
      "10000,100000,1000000").split(",").map(_.trim.toLong).toSeq
    val providers = sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDERS",
      "hdfs,rocksdb").split(",").map(_.trim).toSeq
    val workloads = sys.env.getOrElse("SPARK_GRAFT_STATE_WORKLOADS",
      "window_agg,session").split(",").map(_.trim).toSeq
    val warm = 2
    val keep = 6

    val runs = for {
      provider <- providers
      workload <- workloads
      keys <- keyList
    } yield {
      // one session per (provider, run): the provider conf is
      // per-session, and a fresh session isolates state dirs
      val b = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      if (provider.startsWith("rocksdb"))
        b.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      if (provider == "rocksdb_tuned" || provider == "rocksdb_bounded") {
        b.config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        b.config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
        b.config("spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB", "512")
      }
      if (provider == "rocksdb_bounded") {
        // the fleet-wide memory cap the tuned config's ~2.4 GB trade
        // relies on: ONE shared block-cache+write-buffer budget across
        // every RocksDB instance on the executor, enforced by RocksDB's
        // WriteBufferManager — the A/B that proves the throughput
        // recovery survives a production memory ceiling
        b.config("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
        b.config("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "1024")
      }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try run(spark, workload, provider, keys, ticks, warm, keep)
      finally spark.stop()
    }
    println(s"""{"metric":"stream_state_scale","ticks_per_batch":$ticks,"runs":[${runs.mkString(",")}]}""")
  }

  private def build(spark: SparkSession, workload: String,
                    keys: Long, ticks: Long): DataFrame = {
    val src = TransactionSimulator.userStreamMicroBatch(spark, ticks, keys)
      .withWatermark("ts", "30 seconds")
    workload match {
      case "window_agg" =>
        src.groupBy(window(col("ts"), "1 minute"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("amount")).as("total"))
      case "session" =>
        src.groupBy(session_window(col("ts"), "30 seconds"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("amount")).as("total"))
      case other => sys.error(s"unknown workload $other")
    }
  }

  /** The q_stream_drift monitor topology verbatim
    * (Similarity.driftSums on a streaming embeddings frame): stateless
    * posexplode + ONE streaming aggregation whose state is dims+1
    * rows at ANY corpus size — the `keys` axis is reinterpreted as
    * the embedding DIMENSION (the only thing state scales with), and
    * the state_rows series is the flat-state evidence itself.
    * Complete mode: the monitor has no watermark — closed state is
    * the product, nothing evicts.
    */
  private def buildDrift(spark: SparkSession, dims: Int,
                         ticks: Long): DataFrame =
    graft.operators.Similarity.driftSums(
      TransactionSimulator.embeddingStreamMicroBatch(spark, ticks, dims),
      pmod(col("vec_id"), lit(2)))

  private def run(spark: SparkSession, workload: String, provider: String,
                  keys: Long, ticks: Long, warm: Int, keep: Int): String = {
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"statebench-$workload-$provider-$keys").toString
    val df = if (workload == "drift") buildDrift(spark, keys.toInt, ticks)
      else build(spark, workload, keys, ticks)
    val q = df.writeStream.format("noop")
      .outputMode(if (workload == "drift") "complete" else "append")
      .option("checkpointLocation", ckpt)
      .queryName(s"$workload-$provider-$keys")
      .start()
    try {
      val deadline = System.nanoTime() + 1200L * 1000 * 1000 * 1000
      while ((Option(q.lastProgress).map(_.batchId).getOrElse(-1L))
          < (warm + keep).toLong && System.nanoTime() < deadline)
        Thread.sleep(100)
      val kept = q.recentProgress
        .filter(p => p.batchId >= warm && p.batchId < warm + keep)
      val rows = kept.map(_.numInputRows).sum
      val ms = kept.map(p =>
        Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)).sum
      val evs = if (ms == 0) 0.0 else rows * 1000.0 / ms
      def state(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) =
        kept.map(p => p.stateOperators.map(f).sum)
      val totals = state(_.numRowsTotal)
      val removed = state(_.numRowsRemoved).sum
      val memMb = if (kept.isEmpty) 0L
        else kept.map(p => p.stateOperators.map(_.memoryUsedBytes).sum).max / (1024 * 1024)
      s"""{"workload":"$workload","provider":"$provider","keys":$keys,""" +
        s""""events_per_sec":${f"$evs%.0f"},"batches":${kept.length},""" +
        s""""state_rows_max":${if (totals.isEmpty) 0 else totals.max},""" +
        s""""state_rows_last":${totals.lastOption.getOrElse(0L)},""" +
        s""""state_rows_removed":$removed,"state_mem_mb":$memMb,""" +
        s""""state_rows_series":[${totals.mkString(",")}]}"""
    } finally q.stop()
  }
}
