package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model.{CandleTimeFrame, StockTransaction}
import graft.operators.{CandleQueries, Candles}

class CandlesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // two symbols, two minutes, crafted so OHLC are all distinct
  private lazy val txns = Seq(
    StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
    StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 09:30:20")),
    StockTransaction("AAPL", 8.0, 2, ts("2024-03-01 09:30:40")),
    StockTransaction("AAPL", 11.0, 1, ts("2024-03-01 09:30:59")),
    StockTransaction("AAPL", 20.0, 4, ts("2024-03-01 09:31:10")),
    StockTransaction("MSFT", 100.0, 7, ts("2024-03-01 09:30:30")),
    StockTransaction("MSFT", 90.0, 2, ts("2024-03-01 10:15:00"))
  ).toDF()

  test("gapFill emits every slot with carry-forward close; chunked slots match the naive sequence") {
    val c = Candles.minuteCandles(txns)
    val filled = Candles.gapFill(c.filter($"symbol" === "MSFT"), 60)
    // MSFT: 09:30 .. 10:15 → 46 minute slots, 44 of them gaps
    assert(filled.count() === 46)
    assert(filled.filter($"is_gap").count() === 44)
    val gap = filled.filter($"window_start" === ts("2024-03-01 09:45:00")).collect().head
    assert(gap.getAs[Double]("close_filled") === 100.0) // carried forward
    assert(gap.getAs[Long]("volume") === 0L)
    // a tiny slotChunk must produce the identical slot set (chunking is
    // a materialization detail, not a semantics change)
    val chunked = Candles.gapFill(c, 60, slotChunk = 7)
      .select("symbol", "window_start").collect().toSet
    val plain = Candles.gapFill(c, 60)
      .select("symbol", "window_start").collect().toSet
    assert(chunked === plain)
  }

  test("gapFill slot arrays stay bounded over a multi-year minute-grain range") {
    // 2 candles 3 years apart: ~1.58M minute slots per symbol — the
    // unchunked form would build one 1.58M-element array in a row
    val far = Seq(
      StockTransaction("AAPL", 1.0, 1, ts("2021-01-01 00:00:10")),
      StockTransaction("AAPL", 2.0, 1, ts("2023-12-31 23:59:30"))).toDF()
    val filled = Candles.gapFill(Candles.minuteCandles(far), 60)
    val expected = (ts("2023-12-31 23:59:00").getTime -
      ts("2021-01-01 00:00:00").getTime) / 60000L + 1
    assert(filled.count() === expected)
    // first and last slots present, everything between is the filled series
    assert(filled.agg(min($"window_start"), max($"window_start")).collect().head
      === org.apache.spark.sql.Row(ts("2021-01-01 00:00:00"), ts("2023-12-31 23:59:00")))
  }

  test("minute candles: OHLCV per symbol per minute") {
    val c = Candles.minuteCandles(txns)
    val aapl = c.filter($"symbol" === "AAPL" &&
      $"window_start" === ts("2024-03-01 09:30:00")).collect()
    assert(aapl.length === 1)
    val r = aapl.head
    assert(r.getAs[Double]("open") === 10.0)
    assert(r.getAs[Double]("high") === 12.0)
    assert(r.getAs[Double]("low") === 8.0)
    assert(r.getAs[Double]("close") === 11.0)
    assert(r.getAs[Long]("volume") === 11L)
    assert(r.getAs[Long]("n_txn") === 4L)
    assert(r.getAs[Timestamp]("window_end") === ts("2024-03-01 09:31:00"))
    assert(c.count() === 4) // AAPL×2 minutes + MSFT×2 minutes
  }

  test("rollup to hour keeps first open / last close / extremes / summed volume") {
    val hour = Candles.rollup(Candles.minuteCandles(txns), CandleTimeFrame.Hour)
    val r = hour.filter($"symbol" === "AAPL").collect().head
    assert(r.getAs[Double]("open") === 10.0)   // from 09:30 candle
    assert(r.getAs[Double]("close") === 20.0)  // from 09:31 candle
    assert(r.getAs[Double]("high") === 20.0)
    assert(r.getAs[Double]("low") === 8.0)
    assert(r.getAs[Long]("volume") === 15L)
    assert(r.getAs[Long]("n_txn") === 5L)
    // MSFT spans two hours
    assert(hour.filter($"symbol" === "MSFT").count() === 2)
  }

  test("month rollup uses calendar months and add_months window end") {
    val month = Candles.rollup(Candles.minuteCandles(txns), CandleTimeFrame.Month)
    val r = month.filter($"symbol" === "AAPL").collect().head
    assert(r.getAs[Timestamp]("window_start") === ts("2024-03-01 00:00:00"))
    assert(r.getAs[Timestamp]("window_end") === ts("2024-04-01 00:00:00"))
  }

  test("candle key matches the reference's Redis format") {
    val keys = Candles.minuteCandles(txns)
      .withColumn("k", Candles.candleKey(CandleTimeFrame.Minute))
      .filter($"symbol" === "AAPL" && $"window_start" === ts("2024-03-01 09:30:00"))
      .select("k").as[String].collect()
    assert(keys.toSeq === Seq("candle:AAPL:MINUTE:202403010930"))
  }

  test("multiTimeframe = union of the four frames with dynamic keys") {
    val m = Candles.multiTimeframe(txns).withColumn("k", Candles.candleKeyDynamic)
    assert(m.filter($"timeframe" === "MINUTE").count() === 4)
    assert(m.filter($"timeframe" === "MONTH").count() === 2)
    val dayKey = m.filter($"timeframe" === "DAY" && $"symbol" === "MSFT")
      .select("k").as[String].collect()
    assert(dayKey.toSeq === Seq("candle:MSFT:DAY:20240301"))
  }

  test("multiTimeframe (single-scan rollup) row-equals the union-of-rollups reference") {
    // pins the r16 explode+single-aggregate rewrite to the pre-r16
    // shape: minute frame unioned with three independent rollups
    val minute = Candles.minuteCandles(txns)
    val want = Seq(CandleTimeFrame.Hour, CandleTimeFrame.Day, CandleTimeFrame.Month)
      .map(Candles.rollup(minute, _))
      .foldLeft(minute)(_ unionByName _)
    val got = Candles.multiTimeframe(txns)
    assert(got.schema.map(f => (f.name, f.dataType)) ===
      want.schema.map(f => (f.name, f.dataType)))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("range / recent / point queries") {
    val minute = Candles.minuteCandles(txns)
    val r = CandleQueries.range(minute, "AAPL", CandleTimeFrame.Minute,
      "2024-03-01 09:30:00", "2024-03-01 09:31:00")
    assert(r.count() === 1)
    val rec = CandleQueries.recent(minute, CandleTimeFrame.Minute, 1)
    assert(rec.count() === 2) // one per symbol
    assert(rec.filter($"symbol" === "AAPL").collect().head
      .getAs[Timestamp]("window_start") === ts("2024-03-01 09:31:00"))
    val p = CandleQueries.pointLookup(minute, "MSFT", CandleTimeFrame.Minute,
      "202403011015")
    assert(p.count() === 1)
  }
}
