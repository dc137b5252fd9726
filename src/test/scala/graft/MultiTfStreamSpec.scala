package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.StockTransaction
import graft.operators.Candles
import graft.streaming.CandleStream

class MultiTfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming multiTimeframe (union of 4 windowed aggs) equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StockTransaction]
    val data = Seq(
      StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
      StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 10:15:20")),
      StockTransaction("MSFT", 100.0, 7, ts("2024-03-02 09:30:30")))
    input.addData(data)
    val streamed = CandleStream.runBoundedToMemory(spark,
      CandleStream.multiTimeframe(input.toDF()), "multi_tf_sink")
      .filter($"timeframe" =!= "MONTH") // streaming MONTH = 30d windows, batch = calendar
      .orderBy("timeframe", "symbol", "window_start")
      .collect().toSeq
    val batch = Candles.multiTimeframe(data.toDF())
      .filter($"timeframe" =!= "MONTH")
      .orderBy("timeframe", "symbol", "window_start")
      .collect().toSeq
    assert(streamed === batch)
  }

  test("streaming hop candles (sliding-window agg) equal batch") {
    implicit val sqlCtx = spark.sqlContext
    val txn = Candles.transactions(spark, "/root/testdata/sf0.001")
    val rows = txn.select($"symbol", $"price", $"quantity", $"ts")
      .as[(String, Double, Int, Timestamp)].collect()
    val input = MemoryStream[(String, Double, Int, Timestamp)]
    val q = Candles
      .hopCandles(input.toDF().toDF("symbol", "price", "quantity", "ts"), 600, 300)
      .writeStream.format("memory").queryName("hop_sink")
      .outputMode("complete").start()
    try {
      input.addData(rows.take(rows.length / 2): _*); q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("hop_sink").collect().map(_.toSeq).toSet
    val want = Candles.hopCandles(txn, 600, 300).collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}

class LateDataSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("append mode with zero watermark drops late events (reference's ofSizeWithNoGrace)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StockTransaction]
    val q = CandleStream.candles(input.toDF(), "MINUTE", watermark = "0 seconds")
      .writeStream.format("memory").queryName("late_sink").outputMode("append").start()
    try {
      input.addData(StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")))
      q.processAllAvailable()
      // advance watermark beyond 09:30 so that window closes + emits
      input.addData(StockTransaction("AAPL", 11.0, 1, ts("2024-03-01 10:00:00")))
      q.processAllAvailable()
      // a LATE event for the already-closed 09:30 window: must be dropped
      input.addData(StockTransaction("AAPL", 99.0, 9, ts("2024-03-01 09:30:59")))
      q.processAllAvailable()
      input.addData(StockTransaction("AAPL", 12.0, 1, ts("2024-03-01 11:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val w930 = spark.table("late_sink")
      .filter($"window_start" === ts("2024-03-01 09:30:00")).collect()
    assert(w930.length === 1)          // emitted exactly once
    assert(w930.head.getAs[Long]("volume") === 5L) // late 9-unit txn dropped
    assert(w930.head.getAs[Double]("high") === 10.0)
  }
}
