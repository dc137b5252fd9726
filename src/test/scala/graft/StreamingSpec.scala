package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.{CandleTimeFrame, StockTransaction}
import graft.operators.Candles
import graft.streaming.{CandleStream, TransactionSimulator}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming minute candles equal the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StockTransaction]
    val data = Seq(
      StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
      StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 09:30:20")),
      StockTransaction("AAPL", 8.0, 2, ts("2024-03-01 09:31:40")),
      StockTransaction("MSFT", 100.0, 7, ts("2024-03-01 09:30:30")),
      StockTransaction("MSFT", 104.0, 1, ts("2024-03-01 10:00:00")))
    input.addData(data)

    val streamed = CandleStream.runBoundedToMemory(spark,
      CandleStream.candles(input.toDF(), CandleTimeFrame.Minute),
      "stream_eq_batch_sink")
    val batch = Candles.minuteCandles(data.toDF())

    val a = streamed.orderBy("symbol", "window_start").collect().toSeq
    val b = batch.select(streamed.columns.map(col): _*)
      .orderBy("symbol", "window_start").collect().toSeq
    assert(a === b)
  }

  test("simulator: deterministic, bounded jitter, all symbols each tick") {
    val sim = TransactionSimulator.batch(spark, 100)
    assert(sim.count() === 500)
    assert(sim.select("symbol").distinct().count() === 5)
    // reproducible
    val again = TransactionSimulator.batch(spark, 100)
    assert(sim.orderBy("ts", "symbol").collect().toSeq ===
      again.orderBy("ts", "symbol").collect().toSeq)
    // price stays within the reference's ±~3% envelope of base
    val off = sim.join(
      TransactionSimulator.symbols.toDF("symbol", "base"), "symbol")
      .filter(abs($"price" / $"base" - 1.0) > 0.05)
    assert(off.count() === 0)
    // quantity in 1..100 (StockTransactionGenerator.kt:57)
    assert(sim.filter($"quantity" < 1 || $"quantity" > 100).count() === 0)
  }

  test("simulated stream aggregates into candles end-to-end") {
    val candles = Candles.multiTimeframe(
      TransactionSimulator.batch(spark, 120)) // 2 minutes of ticks
    assert(candles.filter($"timeframe" === "MINUTE").count() === 10)
    assert(candles.filter($"timeframe" === "HOUR").count() === 5)
    val vol = candles.filter($"timeframe" === "HOUR").agg(sum("volume")).as[Long].head
    val volM = candles.filter($"timeframe" === "MINUTE").agg(sum("volume")).as[Long].head
    assert(vol === volM)
  }
}
