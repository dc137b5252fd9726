package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.CandleTimeFrame
import graft.operators.{CandleStore, Candles}

/** Thin HTTP query gateway over a CandleStore — the reference's
  * serving layer (reference: controller/StockChartController.kt:23-60,
  * service/CandleStickService.kt) re-expressed over the
  * partition-pruned store. Uses only the JDK's built-in HttpServer (no
  * added dependencies).
  *
  * Routes (all return JSON arrays of candle rows):
  *   GET /symbols
  *   GET /candles/{symbol}/{tf}?from=YYYY-MM-DD+HH:MM:SS&to=...
  *     [&fill=true]  (fill=true emits a continuous calendar series —
  *     reference CandleStickService.kt:88-101 generateDateTimeSequence
  *     — gap slots carry the prior close, volume 0, is_gap=true)
  *   GET /candles/{symbol}/{tf}/recent?n=25
  *   GET /candles/{symbol}/{tf}/point?key=yyyyMMdd...
  *   GET /keys[/{symbol}[/{tf}]]?limit=N&after=K   (candle:{symbol}:
  *     {tf}:{key} strings — reference getAllCandleKeys/
  *     getSymbolCandleKeys/getSymbolTimeFrameCandleKeys,
  *     CandleStickService.kt:176-196; truncated pages carry an
  *     X-Next-Key cursor reusable verbatim as the next `after`)
  *
  * Serving is driver-side by design: each request is a
  * partition-pruned read of one (timeframe, symbol) directory plus
  * row-group pruning, so the collect returns a chart's worth of rows,
  * not a scan. A production deployment would put a connection-pooled
  * gateway in front of a long-lived SparkSession exactly like this.
  */
object CandleHttpServer {

  /** Hard cap on rows per range response: the collect below is
    * serving-bounded only if something bounds it — without a cap, a
    * multi-year minute-candle range materializes the full result on
    * the gateway heap. Truncated responses carry an `X-Next-From`
    * header (the first unreturned window_start, reusable verbatim as
    * the next request's inclusive `from`).
    */
  val MaxRangeRows = 10000

  private val windowStartRe = """"window_start":"([^"]+)"""".r

  private[serving] def nextCursor(rowJson: String): Option[String] =
    windowStartRe.findFirstMatchIn(rowJson).map(_.group(1))

  def start(spark: SparkSession, storePath: String, port: Int = 0): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", new Handler(spark, storePath))
    server.setExecutor(null) // single-threaded: fine for a test gateway
    server.start()
    server
  }

  private final class Handler(spark: SparkSession, storePath: String)
      extends HttpHandler {

    override def handle(ex: HttpExchange): Unit =
      try {
        val path = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/")
        val query = Option(ex.getRequestURI.getQuery).getOrElse("")
        val params = query.split("&").filter(_.contains("="))
          .map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        path.split("/").toList match {
          case "symbols" :: Nil =>
            respond(ex, 200, toJsonArray(
              CandleStore.keys(spark, storePath).select("symbol").distinct()))
          case "candles" :: symbol :: tf :: Nil =>
            requireTf(tf)
            val limit = params.getOrElse("limit", MaxRangeRows.toString).toInt
            require(limit > 0 && limit <= MaxRangeRows,
              s"limit must be in 1..$MaxRangeRows")
            val ranged = CandleStore.range(spark, storePath, symbol, tf,
              params.getOrElse("from", "1970-01-01 00:00:00"),
              params.getOrElse("to", "9999-01-01 00:00:00"))
            // ?fill=true: continuous calendar series over the range —
            // the reference's range read emits one entry per calendar
            // slot (CandleStickService.kt:88-101
            // generateDateTimeSequence). Gap slots carry the previous
            // close forward (volume 0, is_gap true); the fill spans
            // first..last stored candle inside the requested range, so
            // every emitted row has a defined close
            val rows =
              if (params.get("fill").contains("true")) filledRows(ranged, tf)
              else candleRows(ranged)
            // fetch limit+1: the extra row both signals truncation and
            // carries the next page's inclusive `from` cursor, so the
            // gateway heap is bounded no matter how wide the range is
            val page = rows.limit(limit + 1).toJSON.collect()
            if (page.length > limit)
              nextCursor(page(limit)).foreach(
                ex.getResponseHeaders.set("X-Next-From", _))
            respond(ex, 200,
              page.take(limit).mkString("[", ",", "]"))
          case "candles" :: symbol :: tf :: "recent" :: Nil =>
            requireTf(tf)
            val n = params.getOrElse("n", "25").toInt
            // same gateway-heap bound as the range route's `limit`:
            // recent materializes n rows per symbol before the filter
            require(n > 0 && n <= MaxRangeRows,
              s"n must be in 1..$MaxRangeRows")
            respond(ex, 200, toJsonArray(candleRows(
              CandleStore.recent(spark, storePath, tf, n)
                .filter(org.apache.spark.sql.functions.col("symbol") === symbol))))
          case "keys" :: rest if rest.size <= 2 =>
            val (symbol, tf) = rest match {
              case Nil            => (None, None)
              case s :: Nil       => (Some(s), None)
              case s :: t :: Nil  => requireTf(t); (Some(s), Some(t))
              case _              => (None, None) // unreachable (size <= 2)
            }
            // same gateway-heap bound as the candle routes: key
            // enumeration over a big store must not materialize
            // unbounded rows on the driver
            val limit = params.getOrElse("limit", MaxRangeRows.toString).toInt
            require(limit > 0 && limit <= MaxRangeRows,
              s"limit must be in 1..$MaxRangeRows")
            // keys are emitted in key order, so `after` resumes the
            // enumeration exactly where the last page stopped — same
            // cursor contract as the range route's X-Next-From. The
            // extra fetched row ONLY signals truncation; the cursor is
            // the LAST RETURNED key, page(limit-1), because the
            // `key > after` filter is exclusive — advancing the cursor
            // to the extra row itself would skip one key per page
            val keys = CandleStore.candleKeys(spark, storePath, symbol, tf)
            val page = params.get("after").fold(keys)(
                a => keys.filter(org.apache.spark.sql.functions.col("key") > a))
              .limit(limit + 1).collect().map(_.getString(0))
            if (page.length > limit)
              ex.getResponseHeaders.set("X-Next-Key", page(limit - 1))
            respond(ex, 200, toJsonStringArray(page.take(limit)))
          case "candles" :: symbol :: tf :: "point" :: Nil =>
            requireTf(tf)
            respond(ex, 200, toJsonArray(candleRows(
              CandleStore.point(spark, storePath, symbol, tf, params("key")))))
          case _ =>
            respond(ex, 404, errorJson(s"no such route: /$path"))
        }
      } catch {
        case e: IllegalArgumentException =>
          respond(ex, 400, errorJson(e.getMessage))
        case e: NoSuchElementException => // missing required query param
          respond(ex, 400, errorJson(s"missing required parameter: ${e.getMessage}"))
        case e: Exception =>
          respond(ex, 500, errorJson(e.getClass.getSimpleName))
      } finally ex.close()

    /** Error payloads embed request-derived strings (e.g. the echoed
      * timeframe), so they must be JSON-escaped or a quote in the input
      * would yield an invalid response body.
      */
    private def errorJson(msg: String): String = {
      val escaped = Option(msg).getOrElse("").flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      s"""{"error":"$escaped"}"""
    }

    private def requireTf(tf: String): Unit =
      require(CandleTimeFrame.all.contains(tf),
        s"unknown timeframe $tf (expected one of ${CandleTimeFrame.all.mkString(",")})")

    private def candleRows(df: DataFrame): DataFrame =
      df.select(Candles.candleColumns: _*)

    /** Gap-filled candle rows for the range route: same shape as
      * candleRows plus `is_gap`; filled slots carry the previous close
      * as OHLC (flat candle), volume 0, n_txn 0. Re-sorted by
      * window_start — the gap-fill join does not preserve the range
      * read's order, and the X-Next-From cursor contract requires it.
      */
    private def filledRows(df: DataFrame, tf: String): DataFrame = {
      import org.apache.spark.sql.functions._
      Candles.gapFillTf(df, tf)
        .withColumn("timeframe", lit(tf))
        .withColumn("window_end", Candles.windowEnd(tf, col("window_start")))
        .select(col("symbol"), col("timeframe"),
          col("window_start"), col("window_end"),
          coalesce(col("open"), col("close_filled")).as("open"),
          coalesce(col("high"), col("close_filled")).as("high"),
          coalesce(col("low"), col("close_filled")).as("low"),
          coalesce(col("close"), col("close_filled")).as("close"),
          col("volume"), coalesce(col("n_txn"), lit(0L)).as("n_txn"),
          col("is_gap"))
        .orderBy(col("window_start"))
    }

    private def toJsonArray(df: DataFrame): String =
      df.toJSON.collect().mkString("[", ",", "]")

    /** Strings → JSON array of strings. Keys are
      * `candle:SYM:TF:digits` — nothing to escape in practice, but
      * escape anyway so a hostile symbol value can't break the body.
      */
    private def toJsonStringArray(keys: Seq[String]): String =
      keys.map { k =>
        val s = k.flatMap {
          case '"'  => "\\\""
          case '\\' => "\\\\"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        }
        "\"" + s + "\""
      }.mkString("[", ",", "]")

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    }
  }
}
