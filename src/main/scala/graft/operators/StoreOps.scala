package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared maintenance plumbing for the persisted-artifact stores
  * (CandleStore, BandStore, IvfStore): the rewrite-and-swap step of
  * in-place compaction, and the materialized idempotence probe the
  * appending stores share.
  */
private[graft] object StoreOps {

  /** `batch` minus the rows whose `key` already exists in `store` —
    * the retry-idempotence probe of the appending stores (BandStore,
    * DsirStore, PostingStore, IvfStore). The present set is
    * MATERIALIZED before the caller opens its writer: the probe reads
    * the same path the append will write, and a probe left lazy could
    * be re-evaluated after the append's own files land (Spark's
    * append-to-self lists files at planning time today, but a second
    * action over the result would re-plan). Materialization is
    * EXECUTOR-SIDE — `localCheckpoint(eager = true)` runs the probe
    * now and stores its partitions as executor blocks, truncating the
    * lineage back to the store scan — so the decoupling holds with no
    * driver-heap bill: through round 11 this was a `.collect()` +
    * re-parallelize, a known driver OOM at production micro-batches
    * (10–100M keys). Cost scoping, precisely: the probe's OUTPUT (the
    * materialized present-set blocks) is bounded by the batch's
    * distinct keys — batch-scaled, never store-scaled — because the
    * store scan is semi-join-pruned to batch keys first. The probe's
    * WORK is not: any presence check must consult the store, so the
    * key-column scan is store-scaled, and when the batch is too big
    * for AQE to broadcast (it broadcasts from MEASURED sizes when the
    * id side is small) the sort-merge semi-join shuffles the store's
    * key column once per append. Stores whose layout co-partitions
    * keys with the batch (cell-assigned IvfStore appends probe only
    * the batch's TOUCHED cells via partition pruning —
    * IvfStore.scala) avoid the store-wide scan; the hash-keyed
    * appenders have no such locality to exploit, and at 100 TB the
    * right escape is a bucketed store layout whose storage-
    * partitioned join removes the store-side shuffle.
    *
    * localCheckpoint durability caveat: the materialized blocks are
    * not fault-tolerant — losing an executor mid-append fails the
    * batch's job rather than silently re-reading post-append state.
    * That failure is SAFE here: the batch retries from the source,
    * re-probes from scratch, and the probe-then-append idempotence
    * (gated by graft.ReplayGate) makes the re-apply a no-op for rows
    * that landed.
    *
    * SINGLE-WRITER contract: probe-then-append is idempotent under
    * RE-EXECUTION of one writer (task retry, foreachBatch replay —
    * gated by graft.ReplayGate), not under CONCURRENT writers: two
    * appends overlapping in time can both probe before either's
    * files land and double-apply the overlap. Structured Streaming
    * guarantees this for a store maintained by one query (batches
    * run serially); two pipelines appending to the same store need
    * external serialization (or a manifest-committing table format
    * with conflict detection).
    */
  def antiPresent(batch: DataFrame, store: DataFrame,
                  key: String = "doc_id"): DataFrame = {
    val ids = batch.select(col(key)).distinct()
    val present = store.select(col(key))
      .join(ids, Seq(key), "left_semi")
      .distinct()
      .localCheckpoint(true)
    batch.join(present, Seq(key), "left_anti")
  }

  /** Promote a rewritten copy over the live store. Atomic-ish swap
    * through the Hadoop FileSystem API (works on local paths and HDFS
    * alike; rename is a metadata op on both). True object stores (S3)
    * have no atomic rename — use a manifest-committing table format
    * there instead.
    */
  def swapInPlace(spark: SparkSession, path: String, tmp: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".old")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(dst, bak), s"could not move $path aside")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"could not promote $tmp")
    fs.delete(bak, true)
  }
}
