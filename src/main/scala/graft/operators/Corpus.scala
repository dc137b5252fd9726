package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines:
  * deterministic splits and token-window chunking. Pure projections —
  * scan-speed at any scale, no shuffle.
  */
object Corpus {

  /** Deterministic sampling/split assignment by hashing a stable id:
    * a row is in the sample iff the md5 hex of its id is below the
    * fraction threshold. Unlike rand(seed) sampling this is stable
    * under repartitioning, retries, and engine changes (md5 is
    * engine-portable), which is what makes train/eval splits
    * reproducible across pipeline runs.
    */
  def hashBucket(idCol: Column): Column = md5(idCol.cast("string"))

  /** Hex threshold for a fraction in [0,1] with 4-hex-digit (1/65536)
    * resolution.
    */
  def fractionThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1)
    f"${math.round(fraction * 65536).min(65535)}%04x"
  }

  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < lit(fractionThreshold(fraction)))

  /** Train/eval split label from the same hash. */
  def splitLabel(idCol: Column, trainFraction: Double): Column =
    when(hashBucket(idCol) < lit(fractionThreshold(trainFraction)), "train")
      .otherwise("eval")

  /** Deterministic epoch shuffle — the training-order assignment: a
    * seed-salted hash gives every row a pseudo-random rank, split
    * two-level so no global sort exists: the top 32 hash bits pick a
    * shard (scales with the cluster), a per-shard window assigns the
    * position. Changing the seed reshuffles; same seed + same corpus
    * = bit-identical order on any engine or partitioning (md5, not
    * rand(seed) — Spark's rand is partition-dependent).
    * Emits (shard, pos, id, h).
    */
  def epochShuffle(docs: DataFrame, idCol: String = "doc_id",
                   seed: Long = 0L, nShards: Int = 8): DataFrame = {
    require(nShards > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    docs.select(col(idCol))
      .withColumn("h", hashBucket(concat_ws(":", lit(seed), col(idCol))))
      .withColumn("shard",
        pmod(conv(substring(col("h"), 1, 8), 16, 10).cast("long"), lit(nShards)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col(idCol), col("h"))
  }

  /** Pack chunks into fixed-length training sequences — the
    * pretraining packer: chunks stream in deterministic (doc_id,
    * chunk_id) order within a bucket and a chunk belongs to the
    * sequence its starting token offset falls in (offset div seqLen).
    * Buckets bound the window's partition size: packing is a running
    * token count, inherently sequential, so it runs per-bucket in
    * parallel rather than as one global (single-partition) window —
    * at corpus scale raise nBuckets with the cluster, and swap the
    * mod-bucket for a hash bucket if doc ids are not uniform.
    * Emits one row per packed sequence:
    * (bucket, seq_id, n_chunks, n_tokens, first_doc, last_doc).
    */
  def packSequences(chunks: DataFrame, seqLen: Int = 256,
                    nBuckets: Int = 8): DataFrame = {
    require(seqLen > 0 && nBuckets > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"), col("chunk_id"))
    chunks
      .withColumn("bucket", pmod(col("doc_id"), lit(nBuckets)))
      .withColumn("cum", sum(col("n_chunk_tokens")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_chunk_tokens) div $seqLen"))
      .groupBy(col("bucket"), col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).cast("long").as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Token-window chunking with overlap — the standard RAG/pretraining
    * chunker: whitespace tokens, windows of `size` tokens advancing by
    * `size - overlap`, last window may be short. Emits
    * (doc_id, chunk_id, chunk_text, n_chunk_tokens).
    */
  /** Token-balanced shard plan: assign each document (in doc_id
    * order) to one of `nShards` output shards so every shard carries
    * ~total/nShards TOKENS — the export step before writing training
    * shards, where doc-count balancing (hash mod N) leaves shards
    * skewed by document length. shard = floor(tokens_before · N /
    * total): contiguous in corpus order, deterministic, integer-exact.
    *
    * The running token count rides Ranks.prefixSum (intra-block
    * window + block-carry theta join — no single-partition global
    * window); the corpus total rides a 1-row broadcast. `blockWidth`
    * groups doc_ids into prefix blocks: size it so the block COUNT
    * stays ~10⁴ or less (the carry join is O(blocks²) on a tiny
    * frame) — at 10⁹ docs that means blockWidth ~10⁵.
    */
  def shardPlan(docs: DataFrame, nShards: Int, blockWidth: Long = 1000L,
                textCol: String = "text"): DataFrame = {
    require(nShards > 0 && blockWidth > 0)
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val pre = Ranks.prefixSum(toks, "doc_id", "n_tokens",
      expr(s"doc_id div ${blockWidth}L"), "tokens_before", strict = true)
    Ranks.withGlobalAgg(pre, Seq(sum(col("n_tokens")).as("__total")))
      // trailing zero-token docs can reach tokens_before == total —
      // clamp keeps them in the last shard
      .select(col("doc_id"), col("n_tokens"),
        least(expr(s"(tokens_before * ${nShards}L) div __total"),
          lit(nShards - 1L)).cast("long").as("shard"))
  }

  def chunk(docs: DataFrame, chunkSize: Int, overlap: Int,
            textCol: String = "text"): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize)
    val stride = chunkSize - overlap
    val toks = col("__toks")
    val nChunksM1 = floor((greatest(size(toks), lit(1)) - 1) / stride).cast("int")
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(size(toks) > 0)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), nChunksM1),
          i => slice(toks, i * stride + 1, lit(chunkSize)))))
      .withColumnsRenamed(Map("pos" -> "chunk_id", "col" -> "__chunk"))
      .select(col("doc_id"), col("chunk_id"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).as("n_chunk_tokens"))
  }
}
