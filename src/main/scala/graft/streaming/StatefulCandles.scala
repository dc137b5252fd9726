package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{Candle, CandleTimeFrame, StockTransaction}

/** Custom-state candlestick aggregation via flatMapGroupsWithState —
  * the closest Spark analog of the reference's Kafka Streams
  * `aggregate(initializer, aggregator, Materialized)` with emission on
  * window close (reference: stream/CandlestickAggregator.kt:92-105 and
  * its "데이터는 윈도우 종료 시점에 집계되어 처리" design note).
  *
  * The windowed-aggregation path (CandleStream.candles) is the right
  * default — Spark manages the state format, RocksDB backend, and
  * partial aggregation. This operator exists for semantics the
  * declarative path can't express: per-group custom state machines,
  * exactly-one-emission-per-window on event-time timeout, early/
  * speculative emission policies. State is one small record per open
  * (symbol, window) — bounded by watermark expiry like the
  * reference's window store.
  */
object StatefulCandles {

  /** Running per-window state (the reference's CandleStick buffer,
    * CandlestickAggregator.kt:377-394, minus the 0.0/MIN_VALUE
    * sentinel dance — absence of state IS the initial state here).
    */
  final case class CandleState(
      open: Double, high: Double, low: Double, close: Double,
      volume: Long, nTxn: Long, openTs: Long, closeTs: Long)

  private val minuteMs = 60000L

  /** Minute candles, one emission per (symbol, window) when the event-
    * time watermark passes the window end. Append-mode output.
    */
  def minuteCandles(txns: Dataset[StockTransaction],
                    watermarkDelay: String = "0 seconds"): Dataset[Candle] = {
    import txns.sparkSession.implicits._
    txns
      .withWatermark("ts", watermarkDelay)
      .groupByKey(t => (t.symbol, t.ts.getTime / minuteMs * minuteMs))
      .flatMapGroupsWithState[CandleState, Candle](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  private def update(
      key: (String, Long), events: Iterator[StockTransaction],
      state: GroupState[CandleState]): Iterator[Candle] = {
    val (symbol, startMs) = key
    if (state.hasTimedOut) {
      // window closed: emit exactly once, drop the state
      val s = state.get
      state.remove()
      Iterator.single(Candle(symbol, CandleTimeFrame.Minute,
        new Timestamp(startMs), new Timestamp(startMs + minuteMs),
        s.open, s.high, s.low, s.close, s.volume, s.nTxn))
    } else {
      // fold this micro-batch's events into the running candle
      // (updateCandle, CandlestickAggregator.kt:401-438: open/close by
      // event order — here by event TIME, deterministic under replay)
      var s = state.getOption.orNull
      events.foreach { t =>
        val ms = t.ts.getTime
        s = if (s == null)
          CandleState(t.price, t.price, t.price, t.price, t.quantity.toLong, 1L, ms, ms)
        else CandleState(
          open = if (ms < s.openTs) t.price else s.open,
          high = math.max(s.high, t.price),
          low = math.min(s.low, t.price),
          close = if (ms >= s.closeTs) t.price else s.close,
          volume = s.volume + t.quantity,
          nTxn = s.nTxn + 1,
          openTs = math.min(s.openTs, ms),
          closeTs = math.max(s.closeTs, ms))
      }
      if (s != null) {
        state.update(s)
        // fire when the watermark passes the window end
        state.setTimeoutTimestamp(startMs + minuteMs)
      }
      Iterator.empty
    }
  }
}
