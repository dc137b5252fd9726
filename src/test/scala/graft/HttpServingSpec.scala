package graft

import java.net.URI
import java.nio.file.Files

import scala.io.Source

import org.apache.spark.sql.functions.col

import graft.model.CandleTimeFrame
import graft.operators.{Candles, CandleStore}
import graft.serving.CandleHttpServer
import graft.streaming.TransactionSimulator

/** The reference's serving layer end-to-end: HTTP requests against a
  * store-backed gateway return the same candles the query operators
  * produce (reference: controller/StockChartController.kt:23-60).
  */
class HttpServingSpec extends SparkSpec {
  import spark.implicits._

  private def get(url: String): String = {
    val src = Source.fromInputStream(new URI(url).toURL.openStream(), "UTF-8")
    try src.mkString finally src.close()
  }

  test("symbols / range / recent / point endpoints serve store-backed JSON") {
    val dir = Files.createTempDirectory("http-store").toString
    val candles = Candles.multiTimeframe(TransactionSimulator.batch(spark, 300))
    CandleStore.write(candles, dir)
    val server = CandleHttpServer.start(spark, dir)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val symbols = get(s"$base/symbols")
      assert(symbols.contains("AAPL") && symbols.contains("MSFT"))

      val range = get(s"$base/candles/AAPL/MINUTE?from=2024-01-01+00:00:00&to=2024-01-02+00:00:00")
      val rangeRows = spark.read.json(Seq(range).toDS().as[String])
      val want = graft.operators.CandleQueries.range(
        candles, "AAPL", CandleTimeFrame.Minute,
        "2024-01-01 00:00:00", "2024-01-02 00:00:00").count()
      assert(rangeRows.count() === want && want > 0)

      val recent = spark.read.json(Seq(get(s"$base/candles/AAPL/MINUTE/recent?n=3")).toDS().as[String])
      assert(recent.count() === 3)

      val point = get(s"$base/candles/AAPL/MINUTE/point?key=202401010002")
      assert(point.contains("\"window_start\""))

      // unknown timeframe → 400 with a JSON error, not a 500
      val bad = new URI(s"$base/candles/AAPL/WEEK").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(bad.getResponseCode === 400)

      // error bodies must stay valid JSON even when the echoed input
      // contains quotes/backslashes (the timeframe is interpolated
      // into the message)
      val quoted = new URI(s"$base/candles/AAPL/%22W%5CEEK%22").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(quoted.getResponseCode === 400)
      val quotedBody = Source.fromInputStream(quoted.getErrorStream, "UTF-8").mkString
      val parsed = spark.read.json(Seq(quotedBody).toDS().as[String])
      assert(parsed.columns.contains("error") &&
        !parsed.columns.contains("_corrupt_record"))

      // missing required query param → 400, not a 500
      val noKey = new URI(s"$base/candles/AAPL/MINUTE/point").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(noKey.getResponseCode === 400)

      // range exceeding the cap: bounded pages + X-Next-From cursor
      // chain reassembles exactly the unpaginated result
      def page(from: String): (String, Option[String]) = {
        val enc = java.net.URLEncoder.encode(from, "UTF-8")
        val conn = new URI(s"$base/candles/AAPL/MINUTE?from=$enc&limit=1")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
        (body, Option(conn.getHeaderField("X-Next-From")))
      }
      var from = "1970-01-01 00:00:00"
      var pages = Vector.empty[String]
      var done = false
      var hops = 0
      while (!done && hops < 100) {
        val (body, next) = page(from)
        pages :+= body
        next match { case Some(c) => from = c case None => done = true }
        hops += 1
      }
      assert(hops > 1, "range never truncated — cap untested")
      val reassembled = spark.read.json(pages.toDS().as[String])
      val full = graft.operators.CandleQueries.range(
        candles, "AAPL", CandleTimeFrame.Minute,
        "1970-01-01 00:00:00", "9999-01-01 00:00:00")
      assert(reassembled.count() === full.count())
      assert(reassembled.select("window_start").distinct().count() === full.count())

      // a page under the cap carries no cursor
      val lastPage = new URI(s"$base/candles/AAPL/MINUTE?limit=10000").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(lastPage.getResponseCode === 200 &&
        lastPage.getHeaderField("X-Next-From") == null)

      // out-of-bounds limits → 400
      for (bad <- Seq("0", "10001", "-3")) {
        val c = new URI(s"$base/candles/AAPL/MINUTE?limit=$bad").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        assert(c.getResponseCode === 400, s"limit=$bad not rejected")
      }

      // recent-N shares the same bound: an unbounded n would collect
      // n × symbols rows onto the gateway heap
      for (bad <- Seq("0", "100000000", "-1")) {
        val c = new URI(s"$base/candles/AAPL/MINUTE/recent?n=$bad").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        assert(c.getResponseCode === 400, s"n=$bad not rejected")
      }

      // key enumeration (reference getAllCandleKeys/getSymbolCandleKeys/
      // getSymbolTimeFrameCandleKeys): candle:{symbol}:{TF}:{dateKey}
      // strings, narrowing with each path segment
      def parseKeys(body: String): Seq[String] =
        body.stripPrefix("[").stripSuffix("]").split(",").toSeq
          .filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\""))
      val allKeys = parseKeys(get(s"$base/keys"))
      assert(allKeys.nonEmpty && allKeys.forall(_.startsWith("candle:")))
      assert(allKeys.exists(_.startsWith("candle:AAPL:MINUTE:")) &&
        allKeys.exists(_.startsWith("candle:MSFT:")))

      val aaplKeys = parseKeys(get(s"$base/keys/AAPL"))
      assert(aaplKeys.nonEmpty && aaplKeys.forall(_.startsWith("candle:AAPL:")))
      assert(aaplKeys.exists(_.contains(":HOUR:")),
        "symbol enumeration should span all timeframes")

      val aaplMin = parseKeys(get(s"$base/keys/AAPL/MINUTE"))
      assert(aaplMin.nonEmpty &&
        aaplMin.forall(_.startsWith("candle:AAPL:MINUTE:")))
      // dateKey uses the per-timeframe format: MINUTE → yyyyMMddHHmm
      assert(aaplMin.forall(_.split(":").last.matches("\\d{12}")))
      // the key set is exactly the stored (per-window) candle set
      assert(aaplMin.length ===
        graft.operators.CandleQueries.range(
          candles, "AAPL", CandleTimeFrame.Minute,
          "1970-01-01 00:00:00", "9999-01-01 00:00:00").count())

      // bad timeframe and bad limit still 400 on the keys route
      for (badUrl <- Seq(s"$base/keys/AAPL/WEEK", s"$base/keys?limit=0")) {
        val c = new URI(badUrl).toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        assert(c.getResponseCode === 400, s"$badUrl not rejected")
      }

      // keys pagination: X-Next-Key cursor chain reassembles exactly
      // the unpaginated enumeration (same contract as X-Next-From)
      def keyPage(after: Option[String]): (Seq[String], Option[String]) = {
        val q = after.fold("")(a =>
          "&after=" + java.net.URLEncoder.encode(a, "UTF-8"))
        val conn = new URI(s"$base/keys/AAPL?limit=3$q").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
        (parseKeys(body), Option(conn.getHeaderField("X-Next-Key")))
      }
      var cursor: Option[String] = None
      var collected = Vector.empty[String]
      var keyHops = 0
      var more = true
      while (more && keyHops < 100) {
        val (pageKeys, next) = keyPage(cursor)
        collected ++= pageKeys
        cursor = next
        more = next.isDefined
        keyHops += 1
      }
      assert(keyHops > 1, "keys never truncated — cursor untested")
      assert(collected === aaplKeys,
        "cursor-chained pages diverged from the unpaginated enumeration")
    } finally server.stop(0)
  }

  test("?fill=true serves the continuous calendar series the gapfill query computes") {
    import java.sql.Timestamp
    import graft.model.StockTransaction
    // hour candles at 00, 01 and 04 — hours 02 and 03 are gaps; plus a
    // second month (April) so the MONTH fill has Feb/Mar gaps
    def t(s: String) = Timestamp.valueOf(s)
    val txns = Seq(
      StockTransaction("GAPY", 10.0, 5, t("2024-01-01 00:10:00")),
      StockTransaction("GAPY", 11.0, 2, t("2024-01-01 01:20:00")),
      StockTransaction("GAPY", 14.0, 1, t("2024-01-01 04:05:00")),
      StockTransaction("GAPY", 20.0, 3, t("2024-04-02 09:00:00"))
    ).toDF()
    val dir = Files.createTempDirectory("http-fill-store").toString
    val candles = Candles.multiTimeframe(txns)
    CandleStore.write(candles, dir)
    val server = CandleHttpServer.start(spark, dir)
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val url = s"$base/candles/GAPY/HOUR?from=2024-01-01+00:00:00&to=2024-01-01+06:00:00"
      val unfilled = spark.read.json(Seq(get(url)).toDS().as[String])
      assert(unfilled.count() === 3)

      val filled = spark.read.json(Seq(get(s"$url&fill=true")).toDS().as[String])
      // the served series equals the gapfill operator run over the
      // same range read (the q_candle_gapfill logic)
      val want = Candles.gapFillTf(
        graft.operators.CandleQueries.range(candles, "GAPY",
          CandleTimeFrame.Hour, "2024-01-01 00:00:00", "2024-01-01 06:00:00"),
        CandleTimeFrame.Hour)
        .select(col("symbol"), col("window_start"), col("close_filled"),
          col("is_gap"), col("volume"))
        .orderBy(col("window_start"))
        .collect()
      assert(filled.count() === want.length && want.length === 5)
      val served = filled
        .select(col("symbol"), col("window_start"), col("close"),
          col("is_gap"), col("volume"))
        .orderBy(col("window_start")).collect()
      served.zip(want).foreach { case (s, w) =>
        assert(s.getString(0) === w.getString(0))
        assert(s.getDouble(2) === w.getDouble(2), s"close at ${s.get(1)}")
        assert(s.getBoolean(3) === w.getBoolean(3), s"is_gap at ${s.get(1)}")
        assert(s.getLong(4) === w.getLong(4), s"volume at ${s.get(1)}")
      }
      // gap rows are flat candles carrying the prior close
      val gaps = filled.filter(col("is_gap")).collect()
      assert(gaps.length === 2)
      gaps.foreach { g =>
        val c = g.getAs[Double]("close")
        assert(c === 11.0 &&
          g.getAs[Double]("open") === c && g.getAs[Double]("high") === c &&
          g.getAs[Double]("low") === c && g.getAs[Long]("n_txn") === 0L)
      }

      // MONTH fills on calendar-month steps (Feb/Mar gaps), not a
      // fixed second width
      val months = spark.read.json(Seq(get(
        s"$base/candles/GAPY/MONTH?fill=true")).toDS().as[String])
      val monthStarts = months.select("window_start")
        .orderBy("window_start").as[String].collect()
      assert(monthStarts.length === 4 &&
        monthStarts.head.startsWith("2024-01-01") &&
        monthStarts(1).startsWith("2024-02-01") &&
        monthStarts(2).startsWith("2024-03-01") &&
        monthStarts.last.startsWith("2024-04-01"))
      assert(months.filter(col("is_gap")).count() === 2)

      // fill composes with the cursor contract: limit+fill pages the
      // FILLED series, cursor lands on the first unreturned slot
      val conn = new URI(s"$url&fill=true&limit=2").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      assert(spark.read.json(Seq(body).toDS().as[String]).count() === 2)
      val next = conn.getHeaderField("X-Next-From")
      assert(next != null && next.startsWith("2024-01-01T02:00:00"),
        s"cursor should be the first unreturned filled slot, got $next")
    } finally server.stop(0)
  }
}
