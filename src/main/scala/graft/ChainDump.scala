package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** Dump the signature-chain intermediates for a sampled doc cohort —
  * the Scala side of the THREE-implementation chain check
  * (tools/chain_check.py).
  *
  * Why: the DuckDB oracles for the sketch families reproduce the
  * engine's FNV/splitmix chains bit-exactly, but both encodings are
  * same-author — a shared misunderstanding in the chain DESIGN would
  * pass both. A third, independently-written plain-Python encoding of
  * the published primitives (FNV-1a, splitmix64, LCG permutations)
  * breaks the symmetry: three encodings in three languages agreeing
  * value-for-value is no longer one design checked against itself.
  *
  * Emits one parquet with per-doc: poly_fingerprint64, token FNV
  * hashes, 3- and 5-gram shingle hashes, the 64-perm MinHash
  * signature, the 16 band hashes, and simhash64 — every chain stage
  * the sketch queries key on.
  *
  * Usage: graft.ChainDump <sfDir> <outPath> [mod=50]
  */
object ChainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val mod = if (args.length > 2) args(2).toLong else 50L
    val spark = SparkSession.builder()
      .appName("graft-chain-dump")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val toks = token_fnv_hashes(lower(trim(col("text"))))
    Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(mod)) === 0)
      .select(col("doc_id"),
        poly_fingerprint64(col("text")).as("fingerprint"),
        toks.as("token_hashes"),
        shingle_hashes(toks, 3).as("sh3"),
        shingle_hashes(toks, 5).as("sh5"),
        minhash_signature(shingle_hashes(toks, 3), 64).as("minhash_sig"),
        minhash_band_hashes(shingle_hashes(toks, 3), 64, 16).as("band_hashes"),
        simhash64(toks).as("simhash"))
      .coalesce(1)
      .write.mode("overwrite").parquet(outPath)
    spark.stop()
  }
}
