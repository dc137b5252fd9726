package graft

import org.apache.spark.sql.functions._

import graft.model.CandleTimeFrame
import graft.operators.{Candles, MarketAnalytics}

class EmaSpec extends SparkSpec {
  import spark.implicits._

  test("ema matches a sequential reference computation per symbol") {
    val day = Candles.rollup(
      Candles.minuteCandles(Candles.transactions(spark, "/root/testdata/sf0.001")),
      CandleTimeFrame.Day)
    val got = MarketAnalytics.ema(day, span = 12)
      .select("symbol", "window_start", "close", "ema")
      .orderBy("symbol", "window_start")
      .collect()
    val alpha = 2.0 / 13
    val bySym = got.groupBy(_.getString(0))
    bySym.foreach { case (_, rows) =>
      var state = 0.0
      rows.zipWithIndex.foreach { case (r, i) =>
        val close = r.getDouble(2)
        state = if (i == 0) close else alpha * close + (1 - alpha) * state
        assert(r.getDouble(3) === state, s"row $i of ${r.getString(0)}")
      }
    }
    assert(got.length === day.count())
  }
}
