package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BucketCounts, CosineSimF, GraftShim, HammingWords, HyperplaneSig, Int8Dot, L2SqLong, MinHashBandHashes, MinHashSignature, PigeonholeSplit, PolyFingerprint64, QuantizeI8, ShingleHashes, SignBits, SimHash64, TextProfile, TokenFnvHashes}

/** User-facing Column wrappers for graft's native Catalyst
  * expressions (see org.apache.spark.sql.graft.GraftExpressions).
  */
package object functions {

  /** 64-bit FNV-1a document fingerprint. */
  def poly_fingerprint64(c: Column): Column =
    GraftShim.toColumn(PolyFingerprint64(GraftShim.toExpression(c)))

  /** k-permutation MinHash signature over an array<long> of element
    * hashes.
    */
  def minhash_signature(c: Column, k: Int): Column =
    GraftShim.toColumn(MinHashSignature(GraftShim.toExpression(c), k))

  /** Distinct rolling n-gram shingle hashes over an array<long> of
    * token hashes.
    */
  def shingle_hashes(c: Column, n: Int): Column =
    GraftShim.toColumn(ShingleHashes(GraftShim.toExpression(c), n))

  /** Positional (non-deduplicated) shingle hashes — one hash per
    * shingle start offset, in document order; the winnowing input.
    */
  def shingle_hashes_pos(c: Column, n: Int): Column =
    GraftShim.toColumn(ShingleHashes(GraftShim.toExpression(c), n, dedup = false))

  /** Fused MinHash + LSH banding: `bands` band hashes from an
    * array<long> of shingle hashes.
    */
  def minhash_band_hashes(c: Column, k: Int, bands: Int): Column =
    GraftShim.toColumn(MinHashBandHashes(GraftShim.toExpression(c), k, bands))

  /** 64-bit SimHash over an array<long> of element hashes. */
  def simhash64(c: Column): Column =
    GraftShim.toColumn(SimHash64(GraftShim.toExpression(c)))

  /** Cosine similarity of two array<float> embeddings (double accum,
    * codegen).
    */
  def cosine_sim(a: Column, b: Column): Column =
    GraftShim.toColumn(CosineSimF(GraftShim.toExpression(a), GraftShim.toExpression(b)))

  /** Random-hyperplane LSH signature (nBits ≤ 63) of an array<float>
    * embedding.
    */
  def hyperplane_sig(c: Column, nBits: Int): Column =
    GraftShim.toColumn(HyperplaneSig(GraftShim.toExpression(c), nBits))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** One pigeonhole re-bucketing step of the capped SimHash miner:
    * deal the signature bits not yet fixed by `mask` round-robin in
    * entropy `order` into `chunks` groups; array element c =
    * struct(sub_val = projection onto group c, sub_mask = mask ∪
    * group c's bits). See org.apache.spark.sql.graft.PigeonholeSplit.
    */
  def pigeonhole_split(sig: Column, mask: Column, chunks: Int,
                       order: Seq[Int]): Column =
    GraftShim.toColumn(PigeonholeSplit(GraftShim.toExpression(sig),
      GraftShim.toExpression(mask), chunks, order))

  /** One-pass text profile struct (token/bpeish/punct/CJK/stopword
    * counts) — the codegen'd scan behind TextAnalysis (see
    * org.apache.spark.sql.graft.TextProfile).
    */
  def text_profile(c: Column): Column =
    GraftShim.toColumn(TextProfile(GraftShim.toExpression(c)))

  /** FNV-1a hash per whitespace token — the codegen'd tokenize+hash
    * front of the dedup/shingling chain. Pass pre-lowercased text.
    */
  def token_fnv_hashes(c: Column): Column =
    GraftShim.toColumn(TokenFnvHashes(GraftShim.toExpression(c)))

  /** One-pass hashed-bucket histogram of an array<long>: array of
    * struct(b, n) with b = pmod(hash, buckets), n = occurrences —
    * the per-row equivalent of explode → groupBy(pmod) → count
    * (codegen'd; DSIR's ingest-time pass).
    */
  def bucket_counts(c: Column, buckets: Int): Column =
    GraftShim.toColumn(BucketCounts(GraftShim.toExpression(c), buckets))

  /** Symmetric int8 quantization of an array<float> vector against
    * per-dimension array<double> scales: clamp(floor(v·s), ±127) as
    * array<byte> (4× smaller in flight; codegen'd, engine-portable
    * floor semantics).
    */
  def quantize_i8(vec: Column, scales: Column): Column =
    GraftShim.toColumn(QuantizeI8(GraftShim.toExpression(vec),
      GraftShim.toExpression(scales)))

  /** Integer dot product of two int8-quantized array<byte> vectors —
    * the coarse scoring kernel of quantized ANN (exact long
    * arithmetic, codegen).
    */
  def int8_dot(a: Column, b: Column): Column =
    GraftShim.toColumn(Int8Dot(GraftShim.toExpression(a),
      GraftShim.toExpression(b)))

  /** Squared L2 distance of two fixed-point array<long> vectors —
    * the exact integer scoring kernel of quantized k-means (codegen,
    * engine-portable: a DuckDB oracle reproduces it bit-for-bit).
    */
  def l2sq_long(a: Column, b: Column): Column =
    GraftShim.toColumn(L2SqLong(GraftShim.toExpression(a),
      GraftShim.toExpression(b)))

  /** Sign-bit binarization of an array<float> embedding into packed
    * array<long> words (bit d set iff v[d] > 0) — 1-bit quantization,
    * 32× smaller than float in flight; the binary-ANN index column.
    */
  def sign_bits(vec: Column): Column =
    GraftShim.toColumn(SignBits(GraftShim.toExpression(vec)))

  /** Hamming distance between two packed sign-bit array<long>
    * vectors — the integer-exact coarse scoring kernel of binary ANN
    * (xor + popcount per word, codegen).
    */
  def hamming_words(a: Column, b: Column): Column =
    GraftShim.toColumn(HammingWords(GraftShim.toExpression(a),
      GraftShim.toExpression(b)))

  /** Asymmetric binary score — full-precision query (array<float>)
    * against packed sign bits (array<long>): Σ (bit d ? +q_d : -q_d)
    * = dot(q, sign(c)). The recall upgrade over symmetric hamming at
    * zero extra index memory (codegen; long accum of floor(q_d*1e6)
    * micro-quantized terms in index order — exact, engine-portable).
    */
  def sign_dot(query: Column, signWords: Column): Column =
    GraftShim.toColumn(org.apache.spark.sql.graft.SignDot(
      GraftShim.toExpression(query), GraftShim.toExpression(signWords)))

  /** Distributed bloom-filter build over an int64 key column — one
    * aggregate; the result value is the serialized filter bits (the
    * driver never materializes the key set).
    */
  def bloom_agg(keys: Column, expectedItems: Long, numBits: Long): Column =
    GraftShim.bloomAgg(keys, expectedItems, numBits)

  /** Membership probe against serialized bloom bits (no false
    * negatives; false positives at the built filter's fpp).
    */
  def bloom_might_contain(bits: Column, key: Column): Column =
    GraftShim.bloomMightContain(bits, key)

  /** Register all graft functions for SQL (`SELECT cosine_sim(...)`). */
  def registerAll(spark: SparkSession): Unit = GraftShim.registerAll(spark)
}
