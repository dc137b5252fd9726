package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.{CandleTimeFrame, StockTransaction}
import graft.streaming.CandleStream

class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("toStore appends window-closed candles to the partitioned parquet layout") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("candle-sink").toString
    val chk = Files.createTempDirectory("candle-chk").toString
    val input = MemoryStream[StockTransaction]
    val q = CandleStream.toStore(
      CandleStream.candles(input.toDF(), CandleTimeFrame.Minute), dir, chk).start()
    try {
      input.addData(
        StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
        StockTransaction("MSFT", 99.0, 2, ts("2024-03-01 09:30:30")))
      q.processAllAvailable()
      // append mode holds candles until the watermark passes the window:
      // push it forward, then run the extra batch that flushes
      input.addData(StockTransaction("ZZZ", 1.0, 1, ts("2024-03-01 10:00:00")))
      q.processAllAvailable()
      input.addData(StockTransaction("ZZZ", 1.0, 1, ts("2024-03-01 11:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val stored = spark.read.parquet(dir)
    assert(stored.filter($"symbol" === "AAPL").count() === 1)
    assert(new java.io.File(s"$dir/timeframe=MINUTE/symbol=AAPL").exists(),
      "partitioned (timeframe, symbol) layout expected")
    val aapl = stored.filter($"symbol" === "AAPL").collect().head
    assert(aapl.getAs[Double]("open") === 10.0)
    assert(aapl.getAs[Long]("volume") === 5L)
  }
}
