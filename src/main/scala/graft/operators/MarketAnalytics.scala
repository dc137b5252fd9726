package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market analytics beyond the reference's raw OHLCV surface —
  * the derived-series queries a chart consumer computes from candles
  * (moving averages, returns) plus stream analytics (VWAP,
  * sessionization). All are single-shuffle window/agg plans.
  */
object MarketAnalytics {

  /** Volume-weighted average price per symbol per hour.
    * Exact decimal accumulation (price is 2dp, quantity int) so the
    * result is reproducible regardless of partial-agg order; final
    * division happens in double on exact inputs.
    */
  def vwap(txns: DataFrame): DataFrame =
    txns
      .groupBy(col("symbol"), date_trunc("hour", col("ts")).as("window_start"))
      .agg(
        sum(col("price").cast("decimal(18,4)") * col("quantity").cast("decimal(18,4)"))
          .cast("double").as("pv"),
        sum(col("quantity")).cast("long").as("volume"))
      // zero-volume windows exist (quantity can be 0): NULL, not a
      // divide-by-zero under ANSI mode
      .withColumn("vwap",
        when(col("volume") =!= 0, col("pv") / col("volume")))

  /** Per-candle return vs previous close and a trailing moving average
    * of close over `maWindow` candles — lag/avg window functions over
    * the candle series, partitioned by symbol (one shuffle, state
    * bounded by maWindow).
    */
  def candleChange(candles: DataFrame, maWindow: Int): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val trailing = bySym.rowsBetween(-(maWindow - 1), 0)
    candles
      .withColumn("prev_close", lag(col("close"), 1).over(bySym))
      .withColumn("change", col("close") - col("prev_close"))
      .withColumn("ma_close", avg(col("close")).over(trailing))
  }

  /** Sessionization with an inactivity gap: the scalable batch analog
    * of stateful stream sessionization (lag + cumulative sum of
    * session-break flags; one shuffle on the session key).
    */
  def sessionize(events: DataFrame, key: String, tsCol: String,
                 gapMinutes: Int): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(tsCol))
    val newSession =
      when(col(tsCol).cast("long") - lag(col(tsCol), 1).over(byKey).cast("long")
        > gapMinutes * 60L, 1).otherwise(0)
    events
      .withColumn("is_new_session", coalesce(
        when(lag(col(tsCol), 1).over(byKey).isNull, 1), newSession))
      .withColumn("session_seq",
        sum(col("is_new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("is_new_session")
  }

  /** Session summary: bounds, event count, total value per session. */
  def sessionStats(events: DataFrame, key: String, tsCol: String,
                   gapMinutes: Int): DataFrame =
    sessionize(events, key, tsCol, gapMinutes)
      .groupBy(col(key), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
}
