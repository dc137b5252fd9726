package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.StockTransaction

/** Typed OHLCV Aggregator — the user-facing custom-aggregation API
  * (org.apache.spark.sql.expressions.Aggregator), the typed analog of
  * the reference's initializer/aggregator pair
  * (reference: stream/CandlestickAggregator.kt:99-104 initializeCandle
  * + updateCandle). Usable as
  * `ds.groupByKey(...).agg(CandleAggregator.toColumn)`.
  *
  * The reduction is order-independent (open/close carry their event
  * times in the buffer), so Spark can apply it as a partial aggregate
  * across any partitioning — unlike the reference's arrival-order
  * close.
  */
final case class CandleBuf(
    open: Double, openTs: Long, close: Double, closeTs: Long,
    high: Double, low: Double, volume: Long, nTxn: Long)

final case class Ohlcv(
    open: Double, high: Double, low: Double, close: Double,
    volume: Long, n_txn: Long)

object CandleAggregator extends Aggregator[StockTransaction, CandleBuf, Ohlcv] {
  type Buf = CandleBuf

  override def zero: Buf =
    CandleBuf(0.0, Long.MaxValue, 0.0, Long.MinValue, Double.MinValue, Double.MaxValue, 0L, 0L)

  override def reduce(b: Buf, t: StockTransaction): Buf = {
    val ms = t.ts.getTime
    CandleBuf(
      open = if (ms < b.openTs) t.price else b.open,
      openTs = math.min(b.openTs, ms),
      close = if (ms >= b.closeTs) t.price else b.close,
      closeTs = math.max(b.closeTs, ms),
      high = math.max(b.high, t.price),
      low = math.min(b.low, t.price),
      volume = b.volume + t.quantity,
      nTxn = b.nTxn + 1)
  }

  override def merge(a: Buf, b: Buf): Buf = CandleBuf(
    open = if (a.openTs <= b.openTs) a.open else b.open,
    openTs = math.min(a.openTs, b.openTs),
    close = if (a.closeTs >= b.closeTs) a.close else b.close,
    closeTs = math.max(a.closeTs, b.closeTs),
    high = math.max(a.high, b.high),
    low = math.min(a.low, b.low),
    volume = a.volume + b.volume,
    nTxn = a.nTxn + b.nTxn)

  override def finish(b: Buf): Ohlcv =
    Ohlcv(b.open, b.high, b.low, b.close, b.volume, b.nTxn)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[CandleBuf]
  override def outputEncoder: Encoder[Ohlcv] = Encoders.product[Ohlcv]

  /** Ready-to-use typed column. */
  def column: TypedColumn[StockTransaction, Ohlcv] = toColumn
}
