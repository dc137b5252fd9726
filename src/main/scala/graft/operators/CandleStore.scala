package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CandleTimeFrame

/** Persistent candle store — the Spark-native replacement for the
  * reference's Redis store (reference:
  * stream/CandlestickAggregator.kt:270-277 saveToRedis;
  * service/CandleStickService.kt key scans).
  *
  * The reference's hierarchical key `candle:{symbol}:{tf}:{date}` maps
  * to a parquet layout partitioned by (timeframe, symbol): a point or
  * range lookup prunes to one directory, and the date predicate prunes
  * row groups via parquet min/max stats on window_start. At 100 TB,
  * this is the difference between a full scan and reading a few
  * megabytes; with ~thousands of symbols, directory count stays
  * manageable (4 TFs × |symbols|). For ultra-high symbol cardinality,
  * swap `symbol` for `pmod(xxhash64(symbol), nBuckets)` — the read
  * path below would then prune on the bucket column.
  */
object CandleStore {

  /** Write a candle frame (Candles.* output) as a partitioned store.
    * Candles within a partition are sorted by window_start so parquet
    * row-group stats give tight min/max bounds for time pruning.
    */
  def write(candles: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    candles
      .repartition(col("timeframe"), col("symbol"))
      // partition columns lead so the writer's inserted dynamic-
      // partition sort is a no-op and file ordering is preserved
      .sortWithinPartitions(
        col("timeframe"), col("symbol"), col("window_start"))
      .write
      .mode(mode)
      .partitionBy("timeframe", "symbol")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Range query against the store: timeframe+symbol hit partition
    * pruning, the window_start range hits row-group pruning.
    */
  def range(spark: SparkSession, path: String, symbol: String, tf: String,
            from: String, to: String): DataFrame =
    CandleQueries.range(read(spark, path), symbol, tf, from, to)

  /** Point lookup by the reference's date-key format. */
  def point(spark: SparkSession, path: String, symbol: String, tf: String,
            dateKey: String): DataFrame =
    CandleQueries.pointLookup(read(spark, path), symbol, tf, dateKey)

  /** Latest n candles per symbol from the store (timeframe partition
    * pruned; per-symbol top-k via WindowGroupLimit, no global sort).
    */
  def recent(spark: SparkSession, path: String, tf: String, n: Int): DataFrame =
    CandleQueries.recent(read(spark, path), tf, n)

  /** Enumerate stored candle keys in the reference's
    * `candle:{symbol}:{TF}:{dateKey}` format (reference:
    * service/CandleStickService.kt:176-196 getAllCandleKeys /
    * getSymbolCandleKeys / getSymbolTimeFrameCandleKeys — Redis
    * `KEYS candle:…*` scans). Optional symbol/timeframe filters land
    * on the partition columns, so a filtered enumeration prunes to
    * the matching directories instead of scanning the store — the
    * Spark analogue of Redis's prefix scan.
    */
  def candleKeys(spark: SparkSession, path: String,
                 symbol: Option[String] = None,
                 tf: Option[String] = None): DataFrame = {
    val base = read(spark, path)
    val pruned = Seq(
      symbol.map(col("symbol") === _),
      tf.map(col("timeframe") === _)
    ).flatten.foldLeft(base)(_.filter(_))
    pruned.select(concat(
      lit("candle:"), col("symbol"), lit(":"), col("timeframe"), lit(":"),
      // per-timeframe date format, resolved per row from the
      // timeframe partition value (one when-chain, codegen'd)
      CandleTimeFrame.all.tail.foldLeft(
        when(col("timeframe") === CandleTimeFrame.all.head,
          date_format(col("window_start"),
            CandleTimeFrame.keyFormat(CandleTimeFrame.all.head)))) {
        (acc, t) => acc.when(col("timeframe") === t,
          date_format(col("window_start"), CandleTimeFrame.keyFormat(t)))
      }).as("key"))
      .orderBy("key")
  }

  /** Compact a store in place: streaming/incremental appends leave
    * many small files per partition; rewrite each (timeframe, symbol)
    * partition as ts-sorted files of reasonable size. Routine
    * operational maintenance for any long-lived partitioned table —
    * at 100 TB run it per-partition behind a manifest, not whole-table.
    */
  def compact(spark: SparkSession, path: String,
              maxRecordsPerFile: Long = 5000000L): Unit = {
    val tmp = path.stripSuffix("/") + ".compact.tmp"
    read(spark, path)
      .repartition(col("timeframe"), col("symbol"))
      .sortWithinPartitions(
        col("timeframe"), col("symbol"), col("window_start"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("timeframe", "symbol")
      .parquet(tmp)
    StoreOps.swapInPlace(spark, path, tmp)
  }

  /** Bucketed store layout for ultra-high symbol cardinality: with
    * millions of symbols, one directory per symbol explodes the
    * filesystem metadata, so partition by (timeframe, symbol_bucket =
    * hash(symbol) mod nBuckets) instead. A symbol lookup computes its
    * bucket (pruning to 1/nBuckets of the data), and parquet row-group
    * stats on the symbol column prune inside the bucket (files are
    * written symbol-then-time sorted to keep those stats tight).
    */
  def writeBucketed(candles: DataFrame, path: String, nBuckets: Int = 64,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    candles
      .withColumn("symbol_bucket", pmod(xxhash64(col("symbol")), lit(nBuckets)))
      .repartition(col("timeframe"), col("symbol_bucket"))
      // lead with the partition columns: the dynamic-partition writer
      // inserts its own sort on (timeframe, symbol_bucket) otherwise,
      // which would reorder rows and loosen the per-file symbol/time
      // row-group stats the pruning claim above relies on
      .sortWithinPartitions(
        col("timeframe"), col("symbol_bucket"), col("symbol"), col("window_start"))
      .write
      .mode(mode)
      .partitionBy("timeframe", "symbol_bucket")
      .parquet(path)

  /** Range query against a bucketed store: timeframe + the symbol's
    * bucket hit partition pruning; symbol + time predicates hit
    * row-group pruning inside the bucket.
    */
  def rangeBucketed(spark: SparkSession, path: String, symbol: String,
                    tf: String, from: String, to: String,
                    nBuckets: Int = 64): DataFrame = {
    val bucketed = read(spark, path)
      .filter(col("symbol_bucket") ===
        pmod(xxhash64(lit(symbol)), lit(nBuckets)))
    CandleQueries.range(bucketed, symbol, tf, from, to)
      .drop("symbol_bucket")
  }

  /** All stored (timeframe, symbol) combos — the analog of the
    * reference's Redis `keys candle:*` scans
    * (CandleStickService.kt:181-196), answered from partition
    * directories without touching data files.
    */
  def keys(spark: SparkSession, path: String): DataFrame =
    read(spark, path).select(col("timeframe"), col("symbol")).distinct()
}
