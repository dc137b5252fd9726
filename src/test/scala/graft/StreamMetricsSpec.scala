package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.{CandleTimeFrame, StockTransaction}
import graft.streaming.{CandleStream, StreamMetrics}

/** The metrics listener must see every micro-batch with its true
  * input-row count, and detach cleanly.
  */
class StreamMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("per-batch metrics capture input rows across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val m = StreamMetrics.attach(spark)
    try {
      val input = MemoryStream[StockTransaction]
      val q = CandleStream.candles(input.toDF(), CandleTimeFrame.Minute)
        .writeStream.format("memory").queryName("metrics_sink")
        .outputMode("complete").start()
      try {
        input.addData(
          StockTransaction("AAPL", 10.0, 5, ts("2024-03-01 09:30:05")),
          StockTransaction("MSFT", 99.0, 2, ts("2024-03-01 09:30:10")))
        q.processAllAvailable()
        input.addData(
          StockTransaction("AAPL", 11.0, 1, ts("2024-03-01 09:31:00")))
        q.processAllAvailable()
      } finally q.stop()
      // listener delivery is async; wait for both data batches
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def captured() = m.frame()
        .filter($"query" === "metrics_sink" && $"input_rows" > 0)
      while (captured().count() < 2 && System.nanoTime() < deadline)
        Thread.sleep(100)
      val rows = captured().collect()
      assert(rows.map(_.getAs[Long]("input_rows")).sum === 3L,
        s"captured: ${rows.mkString(", ")}")
      assert(rows.map(_.getAs[Long]("batch_id")).distinct.length === rows.length)
    } finally StreamMetrics.detach(spark, m)
  }
}
