package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted drift-state lifecycle: the [[graft.operators.DsirStore]]
  * pattern applied to the embedding distribution monitor.
  *
  * [[Similarity.driftSums]] reduces a corpus (or a corpus DELTA) to
  * dims+1 rows of exact additive integers. This store persists one
  * such reduction per arriving batch — schema (batch_id, pos, s_a,
  * s_b, h_a, h_b), dims+1 rows per batch — so the standing monitor a
  * training pipeline keeps between snapshots never re-scans old
  * corpus: each new drop folds in as its own compact sums row-group
  * and the one-row screen ([[screen]]) reads the store alone. Because
  * the sums are additive, the folded screen equals the full batch
  * recompute bit-for-bit — gated end-to-end by q_embed_drift_incr
  * (same DuckDB oracle as q_embed_drift, verbatim — the
  * q_dsir_incr precedent).
  *
  * Idempotence: unlike the row-keyed stores (doc_id presence), drift
  * state is SUMS — a re-delivered batch would double-count. The
  * replay key is therefore the caller's `batchId` (foreachBatch's own
  * replay unit): [[append]] probes the store for the batch_id and
  * no-ops when present. The probe is materialized (a driver-side
  * exists check over ONE column pruned to one id — store-scaled scan,
  * constant-sized result) before the writer opens, the
  * [[StoreOps.antiPresent]] discipline; same single-writer and
  * job-atomic-committer contracts as every appending store.
  *
  * Scale shape: the store is dims+1 rows PER BATCH regardless of
  * corpus size (KB-scale per 100 TB drop); [[sums]] folds batches
  * with one groupBy over (batches × dims) rows; [[screen]] is the
  * dims-row readout. Nothing corpus-sized is ever read back.
  */
object DriftStore {

  /** Reduce `vectors` to their drift sums and overwrite the store. */
  def write(vectors: DataFrame, cohort: Column, path: String,
            batchId: Long): Unit =
    Similarity.driftSums(vectors, cohort)
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Fold an arriving batch into the store; a re-delivered batchId is
    * a no-op (foreachBatch retry contract).
    */
  def append(vectors: DataFrame, cohort: Column, path: String,
             batchId: Long): Unit = {
    val spark = vectors.sparkSession
    val present = spark.read.parquet(path)
      .filter(col("batch_id") === batchId)
      .limit(1).count() > 0
    if (!present)
      Similarity.driftSums(vectors, cohort)
        .withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Append).parquet(path)
  }

  /** The folded drift-sums frame over everything appended so far —
    * shaped exactly like a fresh [[Similarity.driftSums]] over the
    * union of the batches (additive integers; null-pos group folds
    * like any other key).
    */
  def sums(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("pos"))
      .agg(sum(col("s_a")).as("s_a"), sum(col("s_b")).as("s_b"),
        sum(col("h_a")).as("h_a"), sum(col("h_b")).as("h_b"))

  /** The one-row integer-exact drift screen over the folded store. */
  def screen(spark: SparkSession, path: String): DataFrame =
    Similarity.driftReadout(sums(spark, path))

  /** Compact the accumulated per-batch rows into one folded baseline
    * (batches × dims rows → dims+1 rows). The baseline KEEPS the max
    * folded batch_id: foreachBatch replay only ever re-delivers the
    * LAST uncommitted batch (earlier ids are checkpoint-committed),
    * so preserving that id keeps the idempotence probe correct across
    * a compaction that races a crash — a re-delivered last batch
    * still probes present. Same swap discipline and single-writer /
    * maintenance-window contract as [[BandStore.compact]].
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val tmp = path.stripSuffix("/") + ".compact.tmp"
    val maxId = spark.read.parquet(path)
      .agg(max(col("batch_id"))).collect()(0).getLong(0)
    sums(spark, path)
      .withColumn("batch_id", lit(maxId))
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    StoreOps.swapInPlace(spark, path, tmp)
  }
}
