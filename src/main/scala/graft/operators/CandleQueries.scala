package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.CandleTimeFrame

/** The reference's query service re-expressed as DataFrame transforms
  * (reference: service/CandleStickService.kt).
  *
  * The reference enumerates Redis keys for a date range and point-gets
  * each (CandleStickService.kt:31-85) — O(range) round-trips. Here a
  * range query is a predicate on the candle frame; against the
  * partitioned CandleStore (see CandleStore.scala) the timeframe and
  * symbol predicates become partition pruning and the time predicate a
  * parquet min/max-pruned scan — no enumeration, no full scan.
  */
object CandleQueries {

  /** (symbol, timeframe, [from, to)) → candles ordered by start time
    * (CandleStickService.kt:31-85 getMultiTimeFrameCandleSticks).
    */
  def range(candles: DataFrame, symbol: String, tf: String,
            from: String, to: String): DataFrame =
    candles
      .filter(col("timeframe") === tf && col("symbol") === symbol &&
        col("window_start") >= to_timestamp(lit(from)) &&
        col("window_start") < to_timestamp(lit(to)))
      .orderBy(col("window_start"))

  /** Latest `n` candles per symbol for one timeframe
    * (CandleStickService.kt:147-175 getRecentMultiTimeFrameCandles).
    * Per-group top-k via row_number — no global sort; at scale this is
    * a single shuffle on symbol with partial top-k pushdown via the
    * window's rank limit (Spark 3.5+ WindowGroupLimit).
    */
  def recent(candles: DataFrame, tf: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("window_start").desc)
    candles
      .filter(col("timeframe") === tf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
  }

  /** Point lookup by date parts (CandleStickService.kt:199-245
    * getCandleByDate / buildKeyByDate): the key equality becomes an
    * equality predicate on the formatted window start.
    */
  def pointLookup(candles: DataFrame, symbol: String, tf: String,
                  dateKey: String): DataFrame =
    candles.filter(
      col("timeframe") === tf && col("symbol") === symbol &&
        date_format(col("window_start"), CandleTimeFrame.keyFormat(tf)) === dateKey)

  /** Available symbols (StockChartController.kt:38-41 — hardcoded
    * there; derived from data here).
    */
  def symbols(txns: DataFrame): DataFrame =
    txns.select(col("symbol")).distinct()
}
