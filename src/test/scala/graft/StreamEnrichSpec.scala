package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Candles
import graft.sources.Tables

/** Stream-static enrichment: a static reference frame (per-symbol
  * closing price derived from the candle pipeline) broadcast-joins a
  * live trade stream — no state, no watermark, append mode. This is
  * the realtime analog of the reference's serving-side lookups
  * (StockChartController reads while the stream aggregates): the
  * static side is planned once per micro-batch as a broadcast hash
  * join, so the stream side never shuffles. Answers must equal the
  * batch join and be independent of micro-batch boundaries.
  */
class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static broadcast enrichment equals the batch join across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val txn = Candles.transactions(spark, "/root/testdata/sf0.001")
    // static dim: the last minute-candle close per symbol
    val dim = Candles.minuteCandles(txn).groupBy($"symbol")
      .agg(max_by($"close", $"window_start").as("ref_close"))

    def enrich(t: org.apache.spark.sql.DataFrame) = t
      .join(broadcast(dim), "symbol")
      .withColumn("pct_vs_ref_micro",
        floor(($"price" - $"ref_close") / $"ref_close" * 1e6).cast("long"))
      .select($"symbol", $"ts", $"price", $"ref_close", $"pct_vs_ref_micro")

    val rows = txn.select($"symbol", $"price", $"quantity", $"ts")
      .as[(String, Double, Int, java.sql.Timestamp)].collect()
    val input = MemoryStream[(String, Double, Int, java.sql.Timestamp)]
    val q = enrich(input.toDF().toDF("symbol", "price", "quantity", "ts"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(rows.take(rows.length / 2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2): _*)
      q.processAllAvailable()
    } finally q.stop()

    def multiset(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val got = multiset(spark.table("enriched").collect())
    val want = multiset(enrich(txn).collect())
    assert(got === want)
    assert(want.values.sum === rows.length) // inner join lost nothing
  }
}
