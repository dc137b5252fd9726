package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market analytics beyond the reference's raw OHLCV surface —
  * the derived-series queries a chart consumer computes from candles
  * (moving averages, returns) plus stream analytics (VWAP,
  * sessionization). All are single-shuffle window/agg plans.
  */
object MarketAnalytics {

  /** Volume-weighted average price per symbol per hour.
    * Exact decimal accumulation (price is 2dp, quantity int) so the
    * result is reproducible regardless of partial-agg order; final
    * division happens in double on exact inputs.
    */
  def vwap(txns: DataFrame): DataFrame =
    txns
      .groupBy(col("symbol"), date_trunc("hour", col("ts")).as("window_start"))
      .agg(
        sum(col("price").cast("decimal(18,4)") * col("quantity").cast("decimal(18,4)"))
          .cast("double").as("pv"),
        sum(col("quantity")).cast("long").as("volume"))
      // zero-volume windows exist (quantity can be 0): NULL, not a
      // divide-by-zero under ANSI mode
      .withColumn("vwap",
        when(col("volume") =!= 0, col("pv") / col("volume")))

  /** Candlestick pattern flags (doji, hammer, bullish/bearish
    * engulfing) over a per-symbol candle series — the chart-overlay
    * scan a candlestick consumer runs on the reference's OHLC output
    * (reference stream/CandlestickAggregator.kt:1 produces the
    * candles; pattern recognition is the standard derived overlay).
    *
    * Determinism: OHLC values are exact SELECTIONS of original prices
    * (arg_min/arg_max/max/min), and every rule below uses only IEEE
    * subtract/multiply/compare on them — correctly rounded and
    * engine-identical, so a DuckDB oracle reproduces the flags
    * bit-for-bit. Rules (body = |close−open|, shadows vs body):
    *  - doji: body·10 ≤ high−low (body within 10% of the range);
    *  - hammer: body > 0, lower shadow ≥ 2·body, upper shadow ≤ body;
    *  - bullish engulfing: previous candle bearish, current bullish,
    *    current body contains the previous body (boundary-inclusive);
    *  - bearish engulfing: mirror image.
    * First candle of a symbol: engulfing flags are false (no prev).
    * One shuffle (the per-symbol window), lag-1 state only.
    */
  def patterns(candles: DataFrame): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val body = abs(col("close") - col("open"))
    val upperShadow = col("high") - greatest(col("open"), col("close"))
    val lowerShadow = least(col("open"), col("close")) - col("low")
    candles
      .withColumn("prev_open", lag(col("open"), 1).over(bySym))
      .withColumn("prev_close", lag(col("close"), 1).over(bySym))
      .withColumn("is_doji", body * 10 <= col("high") - col("low"))
      .withColumn("is_hammer",
        body > 0 && lowerShadow >= body * 2 && upperShadow <= body)
      .withColumn("is_engulf_bull", coalesce(
        col("prev_close") < col("prev_open") && col("close") > col("open") &&
          col("close") >= col("prev_open") && col("open") <= col("prev_close"),
        lit(false)))
      .withColumn("is_engulf_bear", coalesce(
        col("prev_close") > col("prev_open") && col("close") < col("open") &&
          col("open") >= col("prev_close") && col("close") <= col("prev_open"),
        lit(false)))
      .select(col("symbol"), col("window_start"),
        col("is_doji"), col("is_hammer"),
        col("is_engulf_bull"), col("is_engulf_bear"))
  }

  /** Per-candle return vs previous close and a trailing moving average
    * of close over `maWindow` candles — lag/avg window functions over
    * the candle series, partitioned by symbol (one shuffle, state
    * bounded by maWindow).
    */
  def candleChange(candles: DataFrame, maWindow: Int): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val trailing = bySym.rowsBetween(-(maWindow - 1), 0)
    candles
      .withColumn("prev_close", lag(col("close"), 1).over(bySym))
      .withColumn("change", col("close") - col("prev_close"))
      .withColumn("ma_close", avg(col("close")).over(trailing))
  }

  /** Daily top movers: rank symbols by close-over-previous-close return
    * within each day, keep the `k` best and worst. Window over the
    * candle series + per-day rank — two shuffles total.
    */
  def topMovers(dayCandles: DataFrame, k: Int): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val returns = dayCandles
      .withColumn("prev_close", lag(col("close"), 1).over(bySym))
      .filter(col("prev_close").isNotNull && col("prev_close") =!= 0.0)
      .withColumn("return", col("close") / col("prev_close") - 1.0)
    val up = Window.partitionBy(col("window_start"))
      .orderBy(col("return").desc, col("symbol"))
    val down = Window.partitionBy(col("window_start"))
      .orderBy(col("return").asc, col("symbol"))
    returns
      .withColumn("gain_rank", row_number().over(up))
      .withColumn("loss_rank", row_number().over(down))
      .filter(col("gain_rank") <= k || col("loss_rank") <= k)
      .withColumn("direction", when(col("gain_rank") <= k, "gainer").otherwise("loser"))
  }

  /** Pairwise Pearson correlation of daily returns between symbols.
    * Computed from decimal-exact Σx, Σy, Σxy, Σx², Σy² per pair, so
    * the correlations are bit-reproducible. Pairs come from a
    * date-join (s1 < s2); with S symbols this is S²/2 small pairs —
    * at scale the join is on the (tiny) per-day return table, not raw
    * trades.
    */
  def returnCorrelation(dayCandles: DataFrame): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val r = dayCandles
      .withColumn("prev_close", lag(col("close"), 1).over(bySym))
      .filter(col("prev_close").isNotNull && col("prev_close") =!= 0.0)
      .select(col("symbol"), col("window_start"),
        (col("close") / col("prev_close") - 1.0).cast("decimal(18,6)").as("ret"))
    val a = r.select(col("symbol").as("sym_a"), col("window_start"), col("ret").as("ra"))
    val b = r.select(col("symbol").as("sym_b"), col("window_start"), col("ret").as("rb"))
    val joined = a.join(b, "window_start").filter(col("sym_a") < col("sym_b"))
    joined.groupBy(col("sym_a"), col("sym_b"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("ra")).cast("double").as("sx"),
        sum(col("rb")).cast("double").as("sy"),
        // product sums are rounded to 6dp (exact decimal) before the
        // double cast so the doubles are bit-identical cross-engine
        // even when the scale-12 integer form exceeds 2^53
        sum(col("ra") * col("rb")).cast("decimal(38,6)").cast("double").as("sxy"),
        sum(col("ra") * col("ra")).cast("decimal(38,6)").cast("double").as("sxx"),
        sum(col("rb") * col("rb")).cast("decimal(38,6)").cast("double").as("syy"))
      .withColumn("corr_num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("corr_den",
        sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy")))
      .withColumn("corr",
        when(col("corr_den") =!= 0.0, col("corr_num") / col("corr_den")))
      .select(col("sym_a"), col("sym_b"), col("n"), col("corr"))
  }

  /** Market beta: OLS regression slope of each symbol's daily returns
    * against a benchmark symbol's return series (CAPM beta with the
    * benchmark as market proxy). Same decimal-exact moment machinery
    * as [[returnCorrelation]] — returns quantized to decimal(18,6),
    * all Σ terms exact and order-independent, so the emitted doubles
    * are bit-reproducible at any parallelism. The benchmark series is
    * one row per day (tiny) and broadcasts; the moment aggregation is
    * map-side partial on the symbol key.
    */
  def betaVsBenchmark(dayCandles: DataFrame, benchmark: String): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val r = dayCandles
      .withColumn("prev_close", lag(col("close"), 1).over(bySym))
      .filter(col("prev_close").isNotNull && col("prev_close") =!= 0.0)
      .select(col("symbol"), col("window_start"),
        (col("close") / col("prev_close") - 1.0).cast("decimal(18,6)").as("ret"))
    val m = r.filter(col("symbol") === benchmark)
      .select(col("window_start"), col("ret").as("rm"))
    r.filter(col("symbol") =!= benchmark)
      .join(broadcast(m), "window_start")
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("ret")).cast("double").as("sx"),
        sum(col("rm")).cast("double").as("sm"),
        // product sums rounded to 6dp (exact decimal) before the
        // double cast — bit-identical cross-engine (returnCorrelation)
        sum(col("ret") * col("rm")).cast("decimal(38,6)").cast("double").as("sxm"),
        sum(col("rm") * col("rm")).cast("decimal(38,6)").cast("double").as("smm"))
      .withColumn("beta",
        when(col("n") * col("smm") - col("sm") * col("sm") =!= 0.0,
          (col("n") * col("sxm") - col("sx") * col("sm")) /
            (col("n") * col("smm") - col("sm") * col("sm"))))
      .select(col("symbol"), col("n"), col("beta"))
  }

  /** Spearman rank correlation of daily returns for every symbol
    * pair. Ranks are INTEGERS (row_number over (ret, day) — the day
    * tiebreak makes equal returns well-defined), so Σd² is exact and
    * the whole statistic runs in BIGINT arithmetic:
    *   ρ_micro = 10⁶ − (6·10⁶·Σd²) div (n(n²−1))
    * — the subtraction form keeps every integer division positive,
    * where floor and truncate agree in any engine (a direct signed
    * division would be floor-vs-truncate ambiguous cross-engine).
    * One rank window per symbol + the same tiny pair join as
    * [[returnCorrelation]]. Exact Spearman assumes both symbols cover
    * the same days (true for a dense candle series); with ragged
    * coverage the statistic degrades gracefully but is no longer the
    * textbook ρ.
    */
  def spearmanCorrelation(dayCandles: DataFrame): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val r = dayCandles
      .withColumn("prev_close", lag(col("close"), 1).over(bySym))
      .filter(col("prev_close").isNotNull && col("prev_close") =!= 0.0)
      .select(col("symbol"), col("window_start"),
        (col("close") / col("prev_close") - 1.0).cast("decimal(18,6)").as("ret"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("symbol")).orderBy(col("ret"), col("window_start"))))
    val a = r.select(col("symbol").as("sym_a"), col("window_start"), col("rk").as("ra"))
    val b = r.select(col("symbol").as("sym_b"), col("window_start"), col("rk").as("rb"))
    a.join(b, "window_start").filter(col("sym_a") < col("sym_b"))
      .groupBy(col("sym_a"), col("sym_b"))
      .agg(count(lit(1)).as("n"),
        sum((col("ra") - col("rb")) * (col("ra") - col("rb"))).as("d2"))
      // n = 1 (a pair sharing exactly ONE return day) makes the
      // denominator 0 — Spark's non-ANSI div NULLs, DuckDB differs;
      // guard explicitly so the undefined statistic is NULL in every
      // engine (textbook ρ needs n ≥ 2 anyway)
      .withColumn("spearman_micro",
        expr("case when n > 1 then " +
          "1000000 - (6000000 * d2) div (n * (n * n - 1)) end"))
      .select(col("sym_a"), col("sym_b"), col("n"), col("spearman_micro"))
  }

  /** Maximum drawdown per symbol over the candle series: the worst
    * peak-to-trough decline of close vs the running maximum. One
    * per-symbol window (running max is rows-unbounded-preceding, no
    * self-join), then an ordinary min_by aggregate for the trough day
    * — ties broken toward the earliest day via the (drawdown, ws)
    * struct ordering. close/runmax is a division of identical doubles
    * in any engine, so the emitted drawdown is bit-reproducible.
    */
  def maxDrawdown(candles: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
      .rowsBetween(Window.unboundedPreceding, 0)
    candles
      .withColumn("run_max", max(col("close")).over(w))
      .withColumn("dd", col("close") / col("run_max") - 1.0)
      .groupBy(col("symbol"))
      .agg(
        min(col("dd")).as("max_drawdown"),
        min_by(col("window_start"), struct(col("dd"), col("window_start")))
          .as("trough_day"))
  }

  /** Bollinger bands over the candle series: trailing `n`-candle moving
    * average ± `k`·sample-stddev. Variance is computed from EXACT
    * decimal Σx and Σx² (close prices are 2dp ⇒ squares are exact at
    * 4dp), so the doubles — and the bands — are bit-reproducible
    * regardless of partial-agg or frame-accumulation order.
    */
  def bollinger(candles: DataFrame, n: Int = 20, k: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
      .rowsBetween(-(n - 1), 0)
    val cnt = count(col("close")).over(w)
    val s1 = sum(col("close").cast("decimal(18,2)")).over(w).cast("double")
    val s2 = sum((col("close").cast("decimal(18,2)") * col("close").cast("decimal(18,2)")))
      .over(w).cast("double")
    val ma = s1 / cnt
    val variance = when(cnt > 1, (s2 - s1 * s1 / cnt) / (cnt - 1)).otherwise(lit(0.0))
    // FP noise can push a true-zero variance epsilon-negative
    val sd = sqrt(greatest(variance, lit(0.0)))
    candles
      .withColumn("ma", ma)
      .withColumn("sd", sd)
      .withColumn("upper", ma + lit(k) * sd)
      .withColumn("lower", ma - lit(k) * sd)
  }

  /** Relative Strength Index over the candle series (Cutler's RSI:
    * simple moving averages of gains/losses over `n` candles — the
    * SMA variant is window-expressible; Wilder's smoothed variant is
    * the sequential `ema`-style computation below). Decimal-exact
    * sums ⇒ bit-reproducible.
    */
  def rsi(candles: DataFrame, n: Int = 14): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val trailing = bySym.rowsBetween(-(n - 1), 0)
    val change = col("close") - lag(col("close"), 1).over(bySym)
    val gain = when(change > 0, change).otherwise(lit(0.0))
    val loss = when(change < 0, -change).otherwise(lit(0.0))
    val sumGain = sum(gain.cast("decimal(18,6)")).over(trailing).cast("double")
    val sumLoss = sum(loss.cast("decimal(18,6)")).over(trailing).cast("double")
    candles
      .withColumn("rsi",
        when(sumLoss.isNull || sumGain.isNull, lit(null).cast("double"))
          .when(sumLoss === 0.0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + sumGain / sumLoss)))
  }

  /** Stochastic oscillator: %K = (close − lowest low) / (highest high
    * − lowest low) · 100 over an `n`-candle trailing window, and
    * %D = 3-period SMA of %K. The %D average is written as the
    * explicit (k + lag(k,1) + lag(k,2)) / 3 so the FP operation order
    * is pinned (engine-reproducible); NULL until three %K values
    * exist. Flat windows (high == low) emit %K = 50.
    */
  def stochastic(candles: DataFrame, n: Int = 14): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val trailing = bySym.rowsBetween(-(n - 1), 0)
    val loN = min(col("low")).over(trailing)
    val hiN = max(col("high")).over(trailing)
    val pctK = when(hiN === loN, lit(50.0))
      .otherwise((col("close") - loN) / (hiN - loN) * 100.0)
    candles
      .withColumn("pct_k", pctK)
      .withColumn("pct_d",
        (col("pct_k") + lag(col("pct_k"), 1).over(bySym)
          + lag(col("pct_k"), 2).over(bySym)) / 3.0)
  }

  /** On-balance volume: running sum of +volume / −volume / 0 by the
    * sign of the close-over-close change — integer-exact, so the
    * cumulative sum is order-independent and engine-reproducible.
    */
  def obv(candles: DataFrame): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val chg = col("close") - lag(col("close"), 1).over(bySym)
    val signedVol = when(chg > 0, col("volume"))
      .when(chg < 0, -col("volume"))
      .otherwise(lit(0L))
    candles.withColumn("obv",
      sum(signedVol).over(bySym.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Exponential moving average of close per symbol —
    * EMA_t = α·close_t + (1−α)·EMA_{t−1}, α = 2/(span+1).
    *
    * Inherently sequential per symbol, so this is the one operator
    * using the per-partition imperative pattern: repartition by
    * symbol, sort within partitions by time, single forward scan.
    * Scales with symbol cardinality (each symbol's series streams
    * through one task; no driver collect).
    */
  def ema(candles: DataFrame, span: Int = 12, valueCol: String = "close",
          outCol: String = "ema"): DataFrame = {
    val spark = candles.sparkSession
    val alpha = 2.0 / (span + 1)
    val cols = candles.columns
    val valIdx = cols.indexOf(valueCol)
    val symIdx = cols.indexOf("symbol")
    require(valIdx >= 0 && symIdx >= 0, s"needs symbol + $valueCol columns")
    require(!cols.contains(outCol), s"output column $outCol already exists")
    val out = candles
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("window_start"))
      .rdd.mapPartitions { rows =>
        var curSym: String = null
        var state = 0.0
        rows.map { r =>
          val sym = r.getString(symIdx)
          val v = r.getDouble(valIdx)
          state = if (sym != curSym) v
                  else alpha * v + (1 - alpha) * state
          curSym = sym
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ state)
        }
      }
    spark.createDataFrame(out,
      candles.schema.add(outCol, org.apache.spark.sql.types.DoubleType))
  }

  /** MACD (12/26/9): fast and slow EMAs of close, their difference,
    * the signal EMA over that difference, and the histogram — three
    * runs of the same sequential-recurrence pattern as `ema` (the
    * candle table is small relative to raw transactions; each pass is
    * one symbol-partitioned scan).
    */
  def macd(candles: DataFrame, fast: Int = 12, slow: Int = 26,
           signalSpan: Int = 9): DataFrame = {
    val withFast = ema(candles, fast, outCol = "ema_fast")
    val withSlow = ema(withFast, slow, outCol = "ema_slow")
    val withMacd = withSlow.withColumn("macd", col("ema_fast") - col("ema_slow"))
    ema(withMacd, signalSpan, valueCol = "macd", outCol = "macd_signal")
      .withColumn("macd_hist", col("macd") - col("macd_signal"))
  }

  /** Wilder's smoothed RSI — the classic recursive variant
    * (avg = (prev·(n−1) + current)/n after an n-period simple seed).
    * Sequential per symbol like `ema`; same partition-scan pattern.
    */
  def wilderRsi(candles: DataFrame, n: Int = 14): DataFrame = {
    val spark = candles.sparkSession
    val cols = candles.columns
    val closeIdx = cols.indexOf("close")
    val symIdx = cols.indexOf("symbol")
    require(closeIdx >= 0 && symIdx >= 0, "needs symbol + close columns")
    val out = candles
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("window_start"))
      .rdd.mapPartitions { rows =>
        var curSym: String = null
        var prevClose = 0.0
        var count = 0
        var gSum = 0.0; var lSum = 0.0    // seed accumulation
        var avgG = 0.0; var avgL = 0.0
        rows.map { r =>
          val sym = r.getString(symIdx)
          val close = r.getDouble(closeIdx)
          if (sym != curSym) { curSym = sym; prevClose = close; count = 0
            gSum = 0.0; lSum = 0.0; avgG = 0.0; avgL = 0.0 }
          else {
            val ch = close - prevClose
            prevClose = close
            val g = math.max(ch, 0.0); val l = math.max(-ch, 0.0)
            count += 1
            if (count <= n) { gSum += g; lSum += l
              if (count == n) { avgG = gSum / n; avgL = lSum / n } }
            else { avgG = (avgG * (n - 1) + g) / n; avgL = (avgL * (n - 1) + l) / n }
          }
          val rsi: java.lang.Double =
            if (count < n) null
            else if (avgL == 0.0) 100.0
            else 100.0 - 100.0 / (1.0 + avgG / avgL)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ rsi)
        }
      }
    spark.createDataFrame(out,
      candles.schema.add("rsi_wilder", org.apache.spark.sql.types.DoubleType))
  }

  /** Average True Range — Wilder-smoothed volatility:
    * TR = max(high−low, |high−prevClose|, |low−prevClose|) (first
    * candle: high−low), seeded with the n-period simple average of TR
    * and then smoothed as (prevATR·(n−1) + TR)/n. Sequential per
    * symbol like `ema`/`wilderRsi`; NULL until n candles exist.
    */
  def atr(candles: DataFrame, n: Int = 14): DataFrame = {
    val spark = candles.sparkSession
    val cols = candles.columns
    val hIdx = cols.indexOf("high"); val lIdx = cols.indexOf("low")
    val cIdx = cols.indexOf("close"); val symIdx = cols.indexOf("symbol")
    require(hIdx >= 0 && lIdx >= 0 && cIdx >= 0 && symIdx >= 0,
      "needs symbol + high/low/close columns")
    val out = candles
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("window_start"))
      .rdd.mapPartitions { rows =>
        var curSym: String = null
        var prevClose = 0.0
        var count = 0
        var trSum = 0.0
        var atrV = 0.0
        rows.map { r =>
          val sym = r.getString(symIdx)
          val h = r.getDouble(hIdx); val l = r.getDouble(lIdx)
          val c = r.getDouble(cIdx)
          if (sym != curSym) { curSym = sym; count = 0; trSum = 0.0; atrV = 0.0
            prevClose = c }
          val tr =
            if (count == 0) h - l
            else math.max(h - l,
              math.max(math.abs(h - prevClose), math.abs(l - prevClose)))
          prevClose = c
          count += 1
          if (count <= n) { trSum += tr; if (count == n) atrV = trSum / n }
          else atrV = (atrV * (n - 1) + tr) / n
          val outAtr: java.lang.Double = if (count < n) null else atrV
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ outAtr)
        }
      }
    spark.createDataFrame(out,
      candles.schema.add("atr", org.apache.spark.sql.types.DoubleType))
  }

  /** Sessionization with an inactivity gap: the scalable batch analog
    * of stateful stream sessionization (lag + cumulative sum of
    * session-break flags; one shuffle on the session key).
    */
  /** Peak interval concurrency per day — the sweep-line (interval
    * stabbing) aggregate, distributed. A single global running sum
    * over all boundaries would be a one-partition window (the classic
    * scale trap); instead: (a) the running sum partitions by DAY (the
    * fact's one shuffle), and (b) a per-day CARRY — the cumulative
    * net delta of all prior days — rides in from a tiny day-level
    * aggregate whose global window is over one row per day.
    * Intervals spanning days are exactly what the carry accounts for.
    * At the same instant, ends (-1) sort before starts (+1):
    * end-exclusive intervals. Ordering among equal (t, d) rows does
    * not affect the max (monotone runs within the tie group).
    */
  def peakConcurrency(intervals: DataFrame,
                      startCol: String = "session_start",
                      endCol: String = "session_end"): DataFrame = {
    val deltas = intervals.select(col(startCol).as("t"), lit(1).as("d"))
      .unionByName(intervals.select(col(endCol).as("t"), lit(-1).as("d")))
      .withColumn("day", to_date(col("t")))
    val daily = deltas.groupBy(col("day")).agg(sum(col("d")).as("day_delta"))
    // strict prefix (concurrency carried INTO each day) with every
    // window partitioned: intra-month running sum + month-carry
    // theta-join (Ranks.prefixSum) — no single-partition global
    // window over the day frame
    val carry = Ranks.prefixSum(daily, "day", "day_delta",
        date_trunc("month", col("day")), "carry", strict = true)
      .select(col("day"), col("carry"))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas.join(broadcast(carry), "day")
      .withColumn("run", sum(col("d")).over(w) + col("carry"))
      .groupBy(col("day"))
      .agg(max(col("run")).as("peak_concurrency"))
  }

  def sessionize(events: DataFrame, key: String, tsCol: String,
                 gapMinutes: Int): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(tsCol))
    val newSession =
      when(col(tsCol).cast("long") - lag(col(tsCol), 1).over(byKey).cast("long")
        > gapMinutes * 60L, 1).otherwise(0)
    events
      .withColumn("is_new_session", coalesce(
        when(lag(col(tsCol), 1).over(byKey).isNull, 1), newSession))
      .withColumn("session_seq",
        sum(col("is_new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("is_new_session")
  }

  /** Session summary: bounds, event count, total value per session. */
  def sessionStats(events: DataFrame, key: String, tsCol: String,
                   gapMinutes: Int): DataFrame =
    sessionize(events, key, tsCol, gapMinutes)
      .groupBy(col(key), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
}
