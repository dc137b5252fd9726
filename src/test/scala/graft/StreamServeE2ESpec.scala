package graft

import java.net.URI
import java.nio.file.Files
import java.sql.Timestamp

import scala.io.Source

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.{CandleTimeFrame, StockTransaction}
import graft.operators.Candles
import graft.serving.CandleHttpServer
import graft.streaming.CandleStream

/** The reference's whole production loop, live, minus only the
  * env-blocked Kafka bind: transaction stream → incremental candle
  * cascade into the partitioned store → HTTP gateway answering from
  * that store. Every piece is specced separately (CascadeStoreSpec,
  * HttpServingSpec); this proves the composition — the gateway serves
  * correct answers from a store that a STREAM is maintaining,
  * including after a second micro-batch refines existing windows.
  */
class StreamServeE2ESpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def get(url: String): String = {
    val src = Source.fromInputStream(new URI(url).toURL.openStream(), "UTF-8")
    try src.mkString finally src.close()
  }

  test("stream → cascade store → HTTP serve answers match the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("e2e-store").toString
    val chk = Files.createTempDirectory("e2e-chk").toString
    val input = MemoryStream[StockTransaction]
    val q = CandleStream.cascadeToStore(
      CandleStream.candles(input.toDF(), CandleTimeFrame.Minute,
        watermark = "10 minutes"),
      dir, chk)
    val batch1 = Seq(
      StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
      StockTransaction("AAPL", 12.0, 3, ts("2024-03-01 10:15:00")),
      StockTransaction("MSFT", 99.0, 2, ts("2024-03-01 10:10:00")))
    val batch2 = Seq(
      StockTransaction("AAPL", 11.0, 1, ts("2024-03-01 10:15:30")), // refines 10:15
      StockTransaction("MSFT", 98.0, 6, ts("2024-03-01 11:00:00")))
    val server = try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      CandleHttpServer.start(spark, dir)
    } finally q.stop()
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val want = Candles.multiTimeframe((batch1 ++ batch2).toDF())

      // range over the stream-maintained store == batch computation,
      // INCLUDING the batch-2 refinement of the 10:15 window
      val range = spark.read.json(Seq(get(
        s"$base/candles/AAPL/MINUTE?from=2024-03-01+00:00:00&to=2024-03-02+00:00:00"))
        .toDS().as[String])
      val wantRange = graft.operators.CandleQueries.range(
        want, "AAPL", CandleTimeFrame.Minute,
        "2024-03-01 00:00:00", "2024-03-02 00:00:00")
      assert(range.count() === wantRange.count() && range.count() > 0)
      // gateway JSON renders timestamps ISO-8601 ("2024-03-01T10:15:00…")
      val refined = range
        .filter(col("window_start").startsWith("2024-03-01T10:15:00"))
        .select("close", "volume", "n_txn").collect()(0)
      // close follows the later trade; volume/n_txn include both
      assert(refined.getDouble(0) === 11.0 &&
        refined.getLong(1) === 4L && refined.getLong(2) === 2L,
        s"refinement not visible through the gateway: $refined")

      // symbols and key enumeration reflect the streamed content
      val symbols = get(s"$base/symbols")
      assert(symbols.contains("AAPL") && symbols.contains("MSFT"))
      val keys = get(s"$base/keys/MSFT")
      assert(keys.contains("candle:MSFT:MINUTE:202403011100") &&
        keys.contains("candle:MSFT:MONTH:202403"))

      // the full store equals the batch multi-timeframe aggregation
      val got = spark.read.parquet(dir).select(Candles.candleColumns: _*)
      assert(got.collect().toSet ===
        want.select(Candles.candleColumns: _*).collect().toSet)
    } finally server.stop(0)
  }
}
