package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimF, HyperplaneSig, MinHashBandHashes, MinHashSignature, PolyFingerprint64, ShingleHashes, SimHash64}

/** SparkSessionExtensions entry point: registers graft's native
  * functions at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * After registration the functions are usable from SQL:
  * `SELECT cosine_sim(a.embedding, b.embedding) FROM ...`.
  * (For an already-built session, `graft.functions.registerAll`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "", "", "", "scala_udf")
    // arity-checked at plan time: SQL callers passing extra arguments
    // (e.g. hoping to override the fixed k/bands) get a clear error,
    // not silent truncation
    def one(name: String, es: Seq[Expression]): Expression = {
      require(es.length == 1, s"$name expects 1 argument, got ${es.length}")
      es.head
    }
    ext.injectFunction((
      FunctionIdentifier("poly_fingerprint64"),
      info("poly_fingerprint64", "_FUNC_(str) - 64-bit FNV-1a fingerprint"),
      (es: Seq[Expression]) => PolyFingerprint64(one("poly_fingerprint64", es))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "_FUNC_(array<long>) - 64-bit SimHash"),
      (es: Seq[Expression]) => SimHash64(one("simhash64", es))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "_FUNC_(array<float>, array<float>) - cosine similarity"),
      (es: Seq[Expression]) => {
        require(es.length == 2, s"cosine_sim expects 2 arguments, got ${es.length}")
        CosineSimF(es.head, es(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "_FUNC_(array<long>) - 64-permutation MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(one("minhash_signature", es), 64)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "_FUNC_(array<long>) - distinct rolling 3-gram shingle hashes"),
      (es: Seq[Expression]) => ShingleHashes(one("shingle_hashes", es), 3)))
    ext.injectFunction((
      FunctionIdentifier("minhash_band_hashes"),
      info("minhash_band_hashes", "_FUNC_(array<long>) - 16 LSH band hashes of a 64-perm MinHash"),
      (es: Seq[Expression]) => MinHashBandHashes(one("minhash_band_hashes", es), 64, 16)))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig", "_FUNC_(array<float>) - 16-bit random-hyperplane LSH signature"),
      (es: Seq[Expression]) => HyperplaneSig(one("hyperplane_sig", es), 16)))
  }
}
