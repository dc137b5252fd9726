package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Shared maintenance plumbing for the persisted-artifact stores
  * (CandleStore, BandStore, IvfStore): the rewrite-and-swap step of
  * in-place compaction, and the materialized idempotence probe the
  * appending stores share.
  */
private[operators] object StoreOps {

  /** `batch` minus the rows whose `key` already exists in `store` —
    * the retry-idempotence probe of the appending stores (BandStore,
    * DsirStore, PostingStore, IvfStore). The present set is
    * MATERIALIZED on the driver before the caller opens its writer:
    * the probe reads the same path the append will write, and a probe
    * left lazy could be re-evaluated after the append's own files
    * land (Spark's append-to-self lists files at planning time today,
    * but a second action over the result would re-plan). The set is
    * bounded by the batch's distinct keys — batch-scaled, never
    * store-scaled — because the store scan is semi-join-pruned to
    * batch keys first.
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
    val spark = batch.sparkSession
    val ids = batch.select(col(key)).distinct()
    val present: Array[Row] = store.select(col(key))
      .join(broadcast(ids), Seq(key), "left_semi")
      .distinct().collect()
    val presentDf = spark.createDataFrame(
      spark.sparkContext.parallelize(present.toIndexedSeq, 1),
      ids.schema)
    batch.join(broadcast(presentDf), Seq(key), "left_anti")
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
