package graft.model

import java.sql.Timestamp

/** Core domain model, re-expressed from the reference's Kotlin data
  * classes (reference: model/StockTransaction.kt:6,
  * model/CandleStick.kt:5, model/MultiTimeFrameCandleStick.kt:18).
  * Case classes get Spark Encoders for the typed Dataset API.
  */
final case class StockTransaction(
    symbol: String,
    price: Double,
    quantity: Int,
    ts: Timestamp)

/** A single OHLCV candle at one timeframe. Replaces the reference's
  * CandleStick + MultiTimeFrameCandleStick pair (the timeframe column
  * is what MultiTimeFrameCandleStick adds to CandleStick).
  */
final case class Candle(
    symbol: String,
    timeframe: String,
    window_start: Timestamp,
    window_end: Timestamp,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Long,
    n_txn: Long)

/** Candle timeframes (reference: model/MultiTimeFrameCandleStick.kt:9
  * enum CandleTimeFrame). The reference windows MONTH as a fixed 30
  * days but stores it under calendar yyyyMM keys
  * (stream/CandlestickAggregator.kt:168,295); we use true calendar
  * months, matching the key semantics (SURVEY §4).
  */
object CandleTimeFrame {
  val Minute = "MINUTE"
  val Hour = "HOUR"
  val Day = "DAY"
  val Month = "MONTH"
  val all: Seq[String] = Seq(Minute, Hour, Day, Month)

  /** date_trunc unit for each timeframe. */
  def truncUnit(tf: String): String = tf match {
    case Minute => "minute"
    case Hour   => "hour"
    case Day    => "day"
    case Month  => "month"
    case other  => throw new IllegalArgumentException(s"unknown timeframe: $other")
  }

  /** Redis-key date format of the reference
    * (CandlestickAggregator.kt:286-296): yyyyMMddHHmm / yyyyMMddHH /
    * yyyyMMdd / yyyyMM.
    */
  def keyFormat(tf: String): String = tf match {
    case Minute => "yyyyMMddHHmm"
    case Hour   => "yyyyMMddHH"
    case Day    => "yyyyMMdd"
    case Month  => "yyyyMM"
    case other  => throw new IllegalArgumentException(s"unknown timeframe: $other")
  }
}
