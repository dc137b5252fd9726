package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.{CandleTimeFrame, StockTransaction}
import graft.operators.Candles
import graft.streaming.CandleStream

/** The incremental streaming cascade: after any number of micro-batches
  * the store holds exactly the candles the batch multi-timeframe
  * aggregation would produce over all data seen so far — the streaming
  * form of the reference's minute→hour/day/month re-windowing
  * (CandlestickAggregator.kt:119-186).
  */
class CascadeStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("cascadeToStore keeps all four timeframes equal to the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("cascade-store").toString
    val chk = Files.createTempDirectory("cascade-chk").toString
    val input = MemoryStream[StockTransaction]
    val q = CandleStream.cascadeToStore(
      CandleStream.candles(input.toDF(), CandleTimeFrame.Minute, watermark = "10 minutes"),
      dir, chk)
    // batch-2 events stay inside batch-1's watermark horizon
    // (max ts 10:15 − 10 min): a refinement older than that would be
    // correctly dropped as late data by the streaming aggregation
    val batch1 = Seq(
      StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
      StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 10:15:00")),
      StockTransaction("MSFT", 99.0, 2, ts("2024-03-01 10:10:00")))
    val batch2 = Seq(
      StockTransaction("AAPL", 11.0, 1, ts("2024-03-01 10:15:30")), // refines 10:15
      StockTransaction("AAPL", 20.0, 4, ts("2024-04-02 09:00:00")), // new month
      StockTransaction("MSFT", 98.0, 6, ts("2024-03-01 11:00:00")))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val want = Candles.multiTimeframe((batch1 ++ batch2).toDF())
      .select(Candles.candleColumns: _*)
    val got = spark.read.parquet(dir).select(Candles.candleColumns: _*)
    assert(got.count() === want.count())
    assert(got.collect().toSet === want.collect().toSet)
    // all four timeframes are materialized
    assert(got.select("timeframe").distinct().as[String].collect().toSet
      === Set("MINUTE", "HOUR", "DAY", "MONTH"))
  }

  test("mergeBatchIntoStore is idempotent: re-delivering a micro-batch leaves the store unchanged") {
    // Structured Streaming's foreachBatch re-runs a batch after a sink
    // failure; exactly-once for the candle store therefore reduces to
    // the upsert being a no-op on retry (same batchId, same rows).
    val dir = Files.createTempDirectory("idem-store").toString
    val txns1 = Seq(
      StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
      StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 09:30:40")),
      StockTransaction("MSFT", 99.0, 2, ts("2024-03-01 10:10:00"))).toDF()
    val txns2 = Seq(
      StockTransaction("AAPL", 11.0, 1, ts("2024-03-01 09:30:50")), // refines 09:30
      StockTransaction("MSFT", 98.0, 6, ts("2024-03-01 11:00:00"))).toDF()

    def snapshot(): Set[Seq[Any]] =
      spark.read.parquet(dir).select(Candles.candleColumns: _*)
        .collect().map(_.toSeq).toSet

    CandleStream.mergeBatchIntoStore(Candles.minuteCandles(txns1), dir)
    val afterFirst = snapshot()
    // retry of batch 1 against a non-empty store
    CandleStream.mergeBatchIntoStore(Candles.minuteCandles(txns1), dir)
    assert(snapshot() === afterFirst)

    // a refining batch, applied twice, also converges to one apply
    val refined = Candles.minuteCandles(txns1.unionByName(txns2))
      .join(Candles.minuteCandles(txns2).select("symbol", "window_start"),
        Seq("symbol", "window_start"), "left_semi")
    CandleStream.mergeBatchIntoStore(refined, dir)
    val afterSecond = snapshot()
    CandleStream.mergeBatchIntoStore(refined, dir)
    assert(snapshot() === afterSecond)
    assert(afterSecond === Candles.minuteCandles(txns1.unionByName(txns2))
      .collect().map(_.toSeq).toSet)
  }

  test("cascadeMerge is idempotent: re-delivering a minute batch leaves all timeframes unchanged") {
    val dir = Files.createTempDirectory("idem-cascade").toString
    val txns = Seq(
      StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
      StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 10:15:00")),
      StockTransaction("MSFT", 99.0, 2, ts("2024-03-01 10:10:00"))).toDF()
    val minuteBatch = Candles.minuteCandles(txns)
    CandleStream.cascadeMerge(minuteBatch, dir)
    val once = spark.read.parquet(dir).select(Candles.candleColumns: _*)
      .collect().map(_.toSeq).toSet
    CandleStream.cascadeMerge(minuteBatch, dir)
    val twice = spark.read.parquet(dir).select(Candles.candleColumns: _*)
      .collect().map(_.toSeq).toSet
    assert(twice === once)
  }
}
