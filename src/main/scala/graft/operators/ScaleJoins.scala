package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join patterns for the shapes AQE can't always save at 100 TB.
  *
  * - saltedJoin: a hot key floods one reducer in a shuffle join. AQE's
  *   skew-join splits oversized partitions of the BIG side, but when
  *   the matching build side is also large per key, explicit salting
  *   spreads a single key over `saltFactor` reducers deterministically.
  * - bucketed tables: two fact tables bucketed on the join key
  *   co-locate — repeated joins pay zero shuffles (the scan reports
  *   the bucket distribution, Catalyst drops both Exchanges).
  */
object ScaleJoins {

  /** Inner equi-join with the big side salted over `saltFactor`
    * sub-keys and the small-ish side replicated `saltFactor`×.
    * Salt is a content hash — deterministic under task retry (a
    * rand()-based salt re-rolls on retry and can drop/duplicate rows).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val bigCols = big.columns.toIndexedSeq.map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(bigCols: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write `df` as a parquet table bucketed (and sorted) by `key` —
    * the co-location contract joins can rely on.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key).saveAsTable(table)
}
