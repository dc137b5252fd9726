package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted LSH band-table lifecycle: band once, probe per batch.
  *
  * Exact dedup has an incremental path (Dedup.incrementalExact: the
  * corpus prunes to content hashes, a new batch anti-joins them);
  * near-dup dedup gets the same shape here. The corpus's MinHash band
  * table ([[LshDedup.bandTable]] — (doc_id, band, band_hash), one row
  * per doc·band) is written once, partitioned by band, and each
  * arriving batch is banded alone (per-row work over the BATCH only)
  * and joined against the store — the corpus is never re-shingled.
  *
  * Scale shape: the batch's bucket keys are broadcast as a semi-join
  * filter, so only buckets CONTAINING a new doc are ever grouped —
  * work scales with the batch's bucket touch-set, not the corpus.
  * Bucket membership (stored ∪ new) is identical to what a full
  * recompute would see, so the `maxBucket` skew cap fires identically
  * and the emitted pairs equal the full-recompute pairs restricted to
  * pairs involving a batch doc.
  */
object BandStore {

  /** Band the corpus and persist its band table, partitioned by band
    * (band-local file layout keeps per-band probes pruned).
    */
  def write(docs: DataFrame, path: String, k: Int = 64, bands: Int = 16,
            n: Int = 3): Unit =
    LshDedup.bandTable(docs, k, bands, n)
      .write.mode(SaveMode.Overwrite).partitionBy("band").parquet(path)

  /** Fold an accepted batch into the store (after its candidates were
    * mined and the dedup decision applied): append its band rows —
    * banding runs over the batch only. Idempotent under foreachBatch
    * retry: docs already present in the store are skipped (banding is
    * deterministic, so any band row present ⇒ all of the doc's rows
    * are). The presence probe prunes the store scan to the batch's
    * doc_ids via a broadcast semi-join over the doc_id column only —
    * batch-scaled, like the candidates probe — and is materialized
    * before the writer opens ([[StoreOps.antiPresent]]). The
    * any-row⇒all-rows inference assumes a job-atomic output
    * committer (Spark's default v1 protocol; see
    * [[DsirStore.append]]'s scaladoc for the full argument).
    */
  def append(batch: DataFrame, path: String, k: Int = 64, bands: Int = 16,
             n: Int = 3): Unit = {
    val spark = batch.sparkSession
    val fresh = StoreOps.antiPresent(batch, bandTable(spark, path))
    LshDedup.bandTable(fresh, k, bands, n)
      .write.mode(SaveMode.Append).partitionBy("band").parquet(path)
  }

  def bandTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact the band store in place: per-batch appends accumulate
    * small files per band partition; rewrite each band as
    * band_hash-sorted files so the incremental probe's (band,
    * band_hash) semi-join prunes ROW GROUPS via parquet min/max
    * stats, not just files. Same swap discipline as
    * [[CandleStore.compact]]; at 100 TB run per-partition behind a
    * manifest.
    */
  def compact(spark: SparkSession, path: String,
              maxRecordsPerFile: Long = 20000000L): Unit = {
    val tmp = path.stripSuffix("/") + ".compact.tmp"
    bandTable(spark, path)
      .repartition(col("band"))
      .sortWithinPartitions(col("band"), col("band_hash"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("band")
      .parquet(tmp)
    StoreOps.swapInPlace(spark, path, tmp)
  }

  /** Candidate near-dup pairs involving at least one batch doc,
    * against the persisted corpus band table. Equal to
    * [[LshDedup.minhashCandidates]] over (corpus ∪ batch) restricted
    * to pairs with a batch side — without re-banding the corpus.
    */
  def incrementalCandidates(spark: SparkSession, path: String,
                            batch: DataFrame, k: Int = 64, bands: Int = 16,
                            n: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val newBands = LshDedup.bandTable(batch, k, bands, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = newBands.select(col("band"), col("band_hash")).distinct()
    // full membership of every touched bucket: stored rows semi-joined
    // down to the batch's bucket keys, plus the batch's own rows —
    // identical member sets to a full recompute, so the skew cap and
    // the pair set agree with it exactly
    val members = bandTable(spark, path)
      .select(col("doc_id"), col("band"), col("band_hash"))
      .join(broadcast(touched), Seq("band", "band_hash"), "left_semi")
      .unionByName(newBands)
    val pairs = LshDedup.candidatePairs(members, maxBucket)
    val newIds = batch.select(col("doc_id").as("__new_id"))
    LshDedup.unpersistAfterFirstUse(
      pairs.join(broadcast(newIds),
        pairs("doc_a") === col("__new_id") || pairs("doc_b") === col("__new_id"),
        "left_semi"),
      newBands)
  }
}
