package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted DSIR count-table lifecycle: tokenize once per batch,
  * weigh from the store — the [[BandStore]] pattern applied to
  * importance resampling.
  *
  * DSIR is inherently two-pass (per-bucket ratios depend on FULL
  * corpus statistics), so a naive pipeline re-tokenizes the whole
  * corpus every time the target slice or the scoring set changes.
  * The factored shape fixes that: the ingest-time pass
  * ([[Curation.dsirCountTable]]) reduces each batch to its compact
  * (doc_id, is_t, b, n) hashed-bucket counts, this store appends
  * them (counts are keyed by doc_id and doc_ids are disjoint across
  * batches, so the corpus table is the plain UNION of batch tables —
  * no merge arithmetic), and the weight pass
  * ([[Curation.dsirWeightsFromCounts]]) runs over the store alone,
  * never the text. Batch/stream parity is structural — the store's
  * rows ARE the full recompute's count table — and gated end-to-end
  * by q_dsir_incr (same oracle as q_dsir, verbatim).
  *
  * Scale shape: the count table is ≲ one row per token (usually far
  * fewer — buckets collapse repeated tokens), the store append is
  * batch-sized, and the weight pass's only table-sized operations
  * are one aggregate to ≤ `buckets` rows and one broadcast join.
  */
object DsirStore {

  /** Reduce `docs` to their count table and overwrite the store. */
  def write(docs: DataFrame, isTarget: Column, path: String,
            buckets: Int = 256, textCol: String = "text"): Unit =
    Curation.dsirCountTable(docs, isTarget, buckets, textCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Fold an arriving batch into the store: tokenization runs over
    * the BATCH only. Idempotent under foreachBatch retry — docs
    * already present are skipped (counting is deterministic, so any
    * count row present ⇒ all of the doc's rows are), with the
    * presence probe pruned to the batch's doc_ids via a broadcast
    * semi-join, the [[BandStore.append]] discipline.
    *
    * The "any row present ⇒ all rows present" inference assumes a
    * JOB-ATOMIC output committer — Spark's default
    * (SQLHadoopMapReduceCommitProtocol over FileOutputCommitter v1)
    * publishes files only at job commit, so a mid-job failure leaves
    * nothing visible. A task-commit-visible committer
    * (fileoutputcommitter algorithm v2, some cloud committers) voids
    * it: a partially-committed doc would probe as present and its
    * remaining rows would be dropped on retry. Keep v1 (or any
    * job-atomic committer) for store paths.
    *
    * The probe is MATERIALIZED (collected to the driver — it is
    * bounded by the batch's distinct doc_ids) before the writer
    * opens: the probe reads the same path the append writes, and a
    * lazy probe evaluated after new files land would see the
    * append's own output.
    */
  def append(batch: DataFrame, isTarget: Column, path: String,
             buckets: Int = 256, textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val fresh = StoreOps.antiPresent(batch, counts(spark, path))
    Curation.dsirCountTable(fresh, isTarget, buckets, textCol)
      .write.mode(SaveMode.Append).parquet(path)
  }

  def counts(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** DSIR weights over everything folded so far — equals
    * Curation.dsirWeights over the union of the folded batches,
    * bit-for-bit (integer micro weights; spec + q_dsir_incr oracle).
    */
  def weights(spark: SparkSession, path: String,
              buckets: Int = 256): DataFrame =
    Curation.dsirWeightsFromCounts(counts(spark, path), buckets)
}
