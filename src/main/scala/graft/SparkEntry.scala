package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CandleTimeFrame
import graft.operators.{CandleQueries, Candles}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Output conventions (driver hashes values of name-sorted columns):
  *  - timestamps are emitted as 'yyyy-MM-dd HH:mm:ss' strings: Spark
  *    writes TIMESTAMP_LTZ to parquet (read back tz-aware) while the
  *    DuckDB oracle produces naive timestamps — strings sidestep the
  *    tz-awareness mismatch entirely.
  *  - sums over doubles go through DECIMAL(18,4) accumulation (exact,
  *    order-independent) and are cast back to double — bit-identical
  *    to DuckDB's decimal sum, immune to FP accumulation order.
  *  - every query ends in a deterministic ORDER BY mirrored in the
  *    oracle.
  */
object SparkEntry {

  // ---- shared output-formatting helpers -------------------------------

  /** Timestamp → canonical string (see conventions above). */
  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Order-independent exact sum of a double column via decimal. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** Candle frame → driver-comparable output shape. */
  private def candleOut(c: DataFrame): DataFrame =
    c.select(
      col("symbol"), col("timeframe"),
      fmtTs(col("window_start")).as("window_start"),
      fmtTs(col("window_end")).as("window_end"),
      col("open"), col("high"), col("low"), col("close"),
      col("volume"), col("n_txn"))
      .orderBy(col("timeframe"), col("symbol"), col("window_start"))

  /** DuckDB view of the trade stream — must mirror
    * Candles.transactions exactly (incl. the ns→µs truncation Spark's
    * parquet reader forces, Tables.events).
    */
  private val txnCte: String =
    """WITH txn AS (
      |  SELECT event_type AS symbol, value AS price,
      |         CAST(json_extract_string(props, '$.k') AS INTEGER) AS quantity,
      |         make_timestamp(epoch_ns(ts) // 1000) AS ts
      |  FROM events
      |)""".stripMargin

  /** DuckDB minute-candle CTE (appended after txnCte). */
  private val minuteCte: String =
    """, minute_c AS (
      |  SELECT symbol, date_trunc('minute', ts) AS ws,
      |         arg_min(price, ts) AS open, max(price) AS high,
      |         min(price) AS low, arg_max(price, ts) AS close,
      |         CAST(sum(quantity) AS BIGINT) AS volume, count(*) AS n_txn
      |  FROM txn GROUP BY 1, 2
      |)""".stripMargin

  /** DuckDB rollup of minute candles to a coarser calendar unit. */
  private def rollupCte(unit: String): String =
    s""", roll_c AS (
       |  SELECT symbol, date_trunc('$unit', ws) AS ws,
       |         arg_min(open, ws) AS open, max(high) AS high,
       |         min(low) AS low, arg_max(close, ws) AS close,
       |         CAST(sum(volume) AS BIGINT) AS volume,
       |         CAST(sum(n_txn) AS BIGINT) AS n_txn
       |  FROM minute_c GROUP BY 1, 2
       |)""".stripMargin

  private def candleSelect(src: String, tf: String, endExpr: String): String =
    s"""SELECT symbol, '$tf' AS timeframe,
       |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       |  strftime($endExpr, '%Y-%m-%d %H:%M:%S') AS window_end,
       |  open, high, low, close, volume, n_txn
       |FROM $src ORDER BY timeframe, symbol, window_start""".stripMargin

  private def rollupSql(tf: String): String = {
    val unit = CandleTimeFrame.truncUnit(tf)
    txnCte + minuteCte + rollupCte(unit) + "\n" +
      candleSelect("roll_c", tf, s"ws + INTERVAL 1 $unit")
  }

  // ---- driver contract ------------------------------------------------

  /** Flagship: multi-timeframe candles on sf0.001 (driver smoke-checks
    * rows > 0).
    */
  def entry(spark: SparkSession): DataFrame =
    candleOut(Candles.multiTimeframe(
      Candles.transactions(spark, "/root/testdata/sf0.001")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference surface: candlestick engine ----
    "q_candle_minute" -> ((s, dir) =>
      candleOut(Candles.minuteCandles(Candles.transactions(s, dir)))),
    "q_candle_hour" -> ((s, dir) =>
      candleOut(Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Hour))),
    "q_candle_day" -> ((s, dir) =>
      candleOut(Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Day))),
    "q_candle_month" -> ((s, dir) =>
      candleOut(Candles.rollup(
        Candles.minuteCandles(Candles.transactions(s, dir)), CandleTimeFrame.Month))),
    "q_candle_multi_tf" -> ((s, dir) =>
      Candles.multiTimeframe(Candles.transactions(s, dir))
        .withColumn("candle_key", Candles.candleKeyDynamic)
        .select(
          col("symbol"), col("timeframe"),
          fmtTs(col("window_start")).as("window_start"),
          fmtTs(col("window_end")).as("window_end"),
          col("open"), col("high"), col("low"), col("close"),
          col("volume"), col("n_txn"), col("candle_key"))
        .orderBy(col("timeframe"), col("symbol"), col("window_start"))),
    "q_candle_range" -> ((s, dir) =>
      candleOut(CandleQueries.range(
        Candles.minuteCandles(Candles.transactions(s, dir)),
        "click", CandleTimeFrame.Minute, "2024-01-05 00:00:00", "2024-01-10 00:00:00"))),
    "q_candle_recent" -> ((s, dir) =>
      candleOut(CandleQueries.recent(
        Candles.minuteCandles(Candles.transactions(s, dir)),
        CandleTimeFrame.Minute, 5))),
    "q_candle_point" -> ((s, dir) =>
      candleOut(CandleQueries.pointLookup(
        Candles.rollup(Candles.minuteCandles(Candles.transactions(s, dir)),
          CandleTimeFrame.Day),
        "view", CandleTimeFrame.Day, "20240115"))),
    "q_symbols" -> ((s, dir) =>
      CandleQueries.symbols(Candles.transactions(s, dir)).orderBy(col("symbol"))),

    // ---- general engine surface ----
    "q1_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price"), col("sum_disc_price"), col("avg_qty"),
          col("avg_price"), col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_candle_minute" -> (txnCte + minuteCte + "\n" +
      candleSelect("minute_c", "MINUTE", "ws + INTERVAL 1 minute")),
    "q_candle_hour" -> rollupSql(CandleTimeFrame.Hour),
    "q_candle_day" -> rollupSql(CandleTimeFrame.Day),
    "q_candle_month" -> rollupSql(CandleTimeFrame.Month),
    "q_candle_multi_tf" -> (txnCte + minuteCte +
      rollupCte("hour").replace("roll_c", "hour_c") +
      rollupCte("day").replace("roll_c", "day_c") +
      rollupCte("month").replace("roll_c", "month_c") +
      """, uni AS (
        |  SELECT symbol, 'MINUTE' AS timeframe, ws, ws + INTERVAL 1 minute AS we,
        |         open, high, low, close, volume, n_txn, strftime(ws, '%Y%m%d%H%M') AS fmt FROM minute_c
        |  UNION ALL
        |  SELECT symbol, 'HOUR', ws, ws + INTERVAL 1 hour, open, high, low, close,
        |         volume, n_txn, strftime(ws, '%Y%m%d%H') FROM hour_c
        |  UNION ALL
        |  SELECT symbol, 'DAY', ws, ws + INTERVAL 1 day, open, high, low, close,
        |         volume, n_txn, strftime(ws, '%Y%m%d') FROM day_c
        |  UNION ALL
        |  SELECT symbol, 'MONTH', ws, ws + INTERVAL 1 month, open, high, low, close,
        |         volume, n_txn, strftime(ws, '%Y%m') FROM month_c
        |)
        |SELECT symbol, timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(we, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn,
        |  'candle:' || symbol || ':' || timeframe || ':' || fmt AS candle_key
        |FROM uni ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_candle_range" -> (txnCte + minuteCte + "\n" +
      """SELECT symbol, 'MINUTE' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 minute, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM minute_c
        |WHERE symbol = 'click' AND ws >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ws < TIMESTAMP '2024-01-10 00:00:00'
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_candle_recent" -> (txnCte + minuteCte + "\n" +
      """, ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY ws DESC) AS rn
        |  FROM minute_c
        |)
        |SELECT symbol, 'MINUTE' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 minute, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM ranked WHERE rn <= 5
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_candle_point" -> (txnCte + minuteCte + rollupCte("day") + "\n" +
      """SELECT symbol, 'DAY' AS timeframe,
        |  strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 day, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  open, high, low, close, volume, n_txn
        |FROM roll_c
        |WHERE symbol = 'view' AND strftime(ws, '%Y%m%d') = '20240115'
        |ORDER BY timeframe, symbol, window_start""".stripMargin),
    "q_symbols" -> (txnCte + "\n" +
      "SELECT DISTINCT symbol FROM txn ORDER BY symbol"),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
