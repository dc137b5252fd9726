package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted-index lifecycle: posting-list the corpus once,
  * probe per query — the text-retrieval member of the index-artifact
  * family (IVF cells for vectors, LSH bands for near-dup, postings
  * for terms).
  *
  * Layout: one row per (term, doc_id) with its term frequency,
  * partitioned by `term_bucket = hash(term) mod nBuckets` and
  * term-sorted within files. A probe prunes twice: dynamic partition
  * pruning drops unprobed bucket DIRECTORIES at the file level (the
  * broadcast probe join seeds it, same mechanism as IvfStore's cell
  * prune), and the term sort lets parquet min/max stats drop row
  * groups inside a bucket. A k-term query therefore reads ~k/nBuckets
  * of the files, not the corpus.
  *
  * The `nBuckets` used at write/append time must be passed to
  * `lookup` (same contract as BandStore's k/bands/n): a mismatched
  * bucket hash would silently probe the wrong directories.
  */
object PostingStore {

  /** The posting rows of a corpus: (term, doc_id, tf, term_bucket).
    * One (doc, term)-keyed map-side-combined count — the same single
    * shuffle every tf-based operator pays.
    */
  def build(docs: DataFrame, nBuckets: Int = 64,
            textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))

  /** Build and persist the posting table, bucket-partitioned and
    * term-sorted within files (row-group pruning from day one).
    */
  def write(docs: DataFrame, path: String, nBuckets: Int = 64): Unit =
    writeBuilt(build(docs, nBuckets), path)

  /** Persist an already-built posting table ([[build]] output, or a
    * persisted copy shared with another consumer — the tokenize +
    * count pass is the expensive half of a store build, so a caller
    * that also needs the posting rows should build once).
    */
  def writeBuilt(postings: DataFrame, path: String): Unit =
    postings
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term_bucket"), col("term"))
      .write.mode(SaveMode.Overwrite).partitionBy("term_bucket")
      .parquet(path)

  def postings(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Fold a new batch into the store: posting-list the BATCH only and
    * append. Idempotent under foreachBatch retry — docs already
    * present are skipped via a batch-scaled broadcast semi-join
    * presence probe (tokenization is deterministic, so any posting
    * row present ⇒ all of the doc's rows are — the inference assumes
    * a job-atomic committer, see [[DsirStore.append]]). The probe is
    * MATERIALIZED before the writer opens ([[StoreOps.antiPresent]]):
    * it reads the same path the append writes.
    */
  def append(batch: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val fresh = StoreOps.antiPresent(batch, postings(spark, path))
    build(fresh, nBuckets)
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term_bucket"), col("term"))
      .write.mode(SaveMode.Append).partitionBy("term_bucket")
      .parquet(path)
  }

  /** Compact accumulated per-batch appends: rewrite each bucket as
    * term-sorted files so row-group pruning recovers after many
    * appends. Same swap discipline as BandStore/CandleStore.
    */
  def compact(spark: SparkSession, path: String,
              maxRecordsPerFile: Long = 20000000L): Unit = {
    val tmp = path.stripSuffix("/") + ".compact.tmp"
    postings(spark, path)
      .repartition(col("term_bucket"))
      .sortWithinPartitions(col("term_bucket"), col("term"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("term_bucket")
      .parquet(tmp)
    StoreOps.swapInPlace(spark, path, tmp)
  }

  /** Posting lists for a probe term set: (term, doc_id, tf). The
    * probe (with its buckets recomputed under the store's nBuckets)
    * broadcasts; dynamic partition pruning reads only the probed
    * buckets' files.
    */
  def lookup(spark: SparkSession, path: String, terms: DataFrame,
             nBuckets: Int = 64): DataFrame = {
    val probe = terms.select(col("term")).distinct()
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
    postings(spark, path)
      .join(broadcast(probe), Seq("term_bucket", "term"))
      .select(col("term"), col("doc_id"), col("tf"))
  }
}
