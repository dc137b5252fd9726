package graft

import java.sql.Timestamp

import graft.model.StockTransaction
import graft.operators.{CandleAggregator, Candles}

class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("typed Aggregator produces the same OHLCV as the relational aggregation") {
    val data = Seq(
      StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
      StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 09:30:20")),
      StockTransaction("AAPL", 8.0, 2, ts("2024-03-01 09:30:40")),
      StockTransaction("MSFT", 100.0, 7, ts("2024-03-01 09:30:30")))
    val typed = data.toDS()
      .groupByKey(_.symbol)
      .agg(CandleAggregator.column)
      .collect().toMap
    val a = typed("AAPL")
    assert(a.open === 10.0 && a.close === 8.0 && a.high === 12.0 && a.low === 8.0)
    assert(a.volume === 10L && a.n_txn === 3L)
    // matches the relational minute-candle agg rolled to one window
    val rel = Candles.minuteCandles(data.toDF())
      .groupBy($"symbol")
      .agg(org.apache.spark.sql.functions.sum($"volume").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rel("AAPL") === a.volume)
  }

  test("Aggregator merge is order-independent (partial-agg safe)") {
    val t1 = StockTransaction("A", 5.0, 1, ts("2024-03-01 09:00:00"))
    val t2 = StockTransaction("A", 7.0, 2, ts("2024-03-01 09:00:30"))
    val b1 = CandleAggregator.reduce(CandleAggregator.zero, t1)
    val b2 = CandleAggregator.reduce(CandleAggregator.zero, t2)
    assert(CandleAggregator.finish(CandleAggregator.merge(b1, b2)) ===
      CandleAggregator.finish(CandleAggregator.merge(b2, b1)))
  }
}
