package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.StockTransaction
import graft.operators.Candles
import graft.streaming.StatefulCandles

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("flatMapGroupsWithState candles emit once on window close and match batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StockTransaction]
    val data = Seq(
      StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
      StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 09:30:20")),
      StockTransaction("AAPL", 8.0, 2, ts("2024-03-01 09:30:40")),
      StockTransaction("MSFT", 100.0, 7, ts("2024-03-01 09:30:30")),
      StockTransaction("AAPL", 20.0, 4, ts("2024-03-01 09:31:10")))

    val q = StatefulCandles.minuteCandles(input.toDS()).writeStream
      .format("memory").queryName("stateful_candles_sink")
      .outputMode("append").start()
    try {
      input.addData(data)
      q.processAllAvailable()
      // watermark only advances at batch end; push it past every open
      // window with a sentinel, then run another batch so the
      // event-time timeouts fire
      input.addData(StockTransaction("ZZZ", 1.0, 1, ts("2024-03-02 00:00:00")))
      q.processAllAvailable()
      input.addData(StockTransaction("ZZZ", 1.0, 1, ts("2024-03-03 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("stateful_candles_sink")
      .filter($"symbol" =!= "ZZZ")
      .orderBy("symbol", "window_start")
      .collect().toSeq
    val batch = Candles.minuteCandles(data.toDF())
      .select(streamed.head.schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("symbol", "window_start")
      .collect().toSeq
    assert(streamed === batch)
    assert(streamed.length === 3) // AAPL 09:30, AAPL 09:31, MSFT 09:30
  }
}
