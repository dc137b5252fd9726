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

  test("wilderRsi matches a sequential reference computation") {
    val day = Candles.rollup(
      Candles.minuteCandles(Candles.transactions(spark, "/root/testdata/sf0.001")),
      CandleTimeFrame.Day)
    val n = 14
    val got = MarketAnalytics.wilderRsi(day, n)
      .select("symbol", "window_start", "close", "rsi_wilder")
      .orderBy("symbol", "window_start")
      .collect()
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      var prev = 0.0; var cnt = 0; var gS = 0.0; var lS = 0.0
      var aG = 0.0; var aL = 0.0
      rows.zipWithIndex.foreach { case (r, i) =>
        val close = r.getDouble(2)
        if (i == 0) { prev = close }
        else {
          val ch = close - prev; prev = close
          val g = math.max(ch, 0.0); val l = math.max(-ch, 0.0)
          cnt += 1
          if (cnt <= n) { gS += g; lS += l; if (cnt == n) { aG = gS / n; aL = lS / n } }
          else { aG = (aG * (n - 1) + g) / n; aL = (aL * (n - 1) + l) / n }
        }
        val want: Option[Double] =
          if (cnt < n) None
          else if (aL == 0.0) Some(100.0)
          else Some(100.0 - 100.0 / (1.0 + aG / aL))
        val gotV = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        assert(gotV === want, s"row $i of ${r.getString(0)}")
      }
    }
  }
}
