package graft

import java.sql.Timestamp

import graft.operators.MarketAnalytics

/** Candlestick pattern rules on crafted candles — each flag has a
  * positive and a negative witness, and the first candle of a symbol
  * can't be an engulfing (no previous body).
  */
class PatternsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  // (symbol, window_start, open, high, low, close)
  private lazy val candles = Seq(
    // doji: body 0.1, range 2.0 (0.1*10 <= 2.0) with long shadows both
    // sides (so not a hammer)
    ("a", ts(1), 10.0, 11.0, 9.0, 10.1),
    // hammer: body 0.5 (10.0→10.5), lower shadow 2.0 ≥ 2·body, upper 0
    ("a", ts(2), 10.0, 10.5, 8.0, 10.5),
    // bearish day (body 1.0, small range ⇒ no doji): sets up engulfing
    ("a", ts(3), 10.0, 10.1, 8.9, 9.0),
    // bullish engulfing of day 3's body: open 8.9 ≤ 9.0, close 10.2 ≥ 10.0
    ("a", ts(4), 8.9, 10.3, 8.8, 10.2),
    // bearish engulfing of day 4's bullish body: open 10.3 ≥ 10.2, close 8.8 ≤ 8.9
    ("a", ts(5), 10.3, 10.4, 8.7, 8.8),
    // another symbol's FIRST candle shaped like an engulfer: must stay
    // false (lag is per-symbol)
    ("b", ts(1), 8.9, 10.3, 8.8, 10.2)
  ).toDF("symbol", "window_start", "open", "high", "low", "close")

  test("each pattern fires exactly where constructed") {
    val got = MarketAnalytics.patterns(candles)
      .orderBy("symbol", "window_start")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    val byKey = got.map(t => (t._1, t._2) -> (t._3, t._4, t._5, t._6)).toMap
    assert(byKey(("a", "2024-01-01")) == (true, false, false, false))
    assert(byKey(("a", "2024-01-02")) == (false, true, false, false))
    assert(byKey(("a", "2024-01-03")) == (false, false, false, false))
    assert(byKey(("a", "2024-01-04")) == (false, false, true, false))
    assert(byKey(("a", "2024-01-05")) == (false, false, false, true))
    assert(byKey(("b", "2024-01-01")) == (false, false, false, false),
      "first candle of a symbol must not see another symbol's previous candle")
  }
}
