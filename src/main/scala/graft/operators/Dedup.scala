package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines.
  *
  * Scale design: exact dedup is one hash-groupBy shuffle (the hash —
  * 16 bytes — shuffles, never the document bodies). Near-dup
  * (MinHash/SimHash, see LshDedup) turns the O(n²) pair space into
  * band-bucket shuffles.
  */
object Dedup {

  /** Canonical text form for exact matching: lowercase, trim, collapse
    * runs of whitespace.
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Content hash of the normalized text (md5: stable across engines,
    * collision-safe enough for dedup bucketing at corpus scale).
    */
  def contentHash(text: Column): Column = md5(normalized(text))

  /** One row per distinct content: the keeper (min doc_id) and the
    * duplicate count. Shuffles only (hash, doc_id) pairs.
    */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(contentHash(col(textCol)).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated corpus: keeps the min-doc_id row of each
    * content group. Window-free formulation would use a semi-join on
    * exactGroups; the window form keeps it one shuffle.
    */
  def dropExactDuplicates(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(contentHash(col(textCol))).orderBy(col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles (distinct) — the unit set for Jaccard /
    * MinHash.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    // guard: sequence(0, negative) counts DOWN — short docs get no shingles
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact n-gram Jaccard similarity between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) > 0,
      size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))
      .otherwise(lit(0.0))
}
