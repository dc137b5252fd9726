package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.{CandleTimeFrame, StockTransaction}
import graft.streaming.CandleStream

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("upsertToStore keeps exactly the latest version of every candle") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("upsert-store").toString
    val chk = Files.createTempDirectory("upsert-chk").toString
    val input = MemoryStream[StockTransaction]
    val q = CandleStream.upsertToStore(
      CandleStream.candles(input.toDF(), CandleTimeFrame.Minute, watermark = "10 minutes"), dir, chk)
    try {
      // batch 1: two windows
      input.addData(
        StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
        StockTransaction("MSFT", 99.0, 2, ts("2024-03-01 09:31:00")))
      q.processAllAvailable()
      // batch 2: refine the AAPL 09:30 window (update-in-place) and
      // add a new window — MSFT's row must survive untouched
      input.addData(
        StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 09:30:40")),
        StockTransaction("AAPL", 20.0, 1, ts("2024-03-01 09:32:00")))
      q.processAllAvailable()
    } finally q.stop()

    val store = spark.read.parquet(dir)
    assert(store.count() === 3) // 3 distinct windows, no duplicates
    val aapl930 = store.filter($"symbol" === "AAPL" &&
      $"window_start" === ts("2024-03-01 09:30:00")).collect().head
    assert(aapl930.getAs[Double]("close") === 12.0) // refined version
    assert(aapl930.getAs[Long]("volume") === 8L)    // 5 + 3
    assert(store.filter($"symbol" === "MSFT").count() === 1)
  }
}
