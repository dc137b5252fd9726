package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Stream-stream join: the one streaming join mode not covered by
  * StreamEnrichSpec (stream-static). Two live streams — views and
  * clicks split from the event feed — inner-join on user with an
  * event-time band (click within 10 minutes after the view), both
  * sides watermarked so Spark can bound the join state and emit in
  * append mode. The time-band + watermark is exactly how a 100 TB
  * deployment keeps stream-stream state finite: state per side is
  * bounded by (watermark delay + band width) of data, not the stream
  * history. Answers must equal the batch interval join and be
  * independent of micro-batch boundaries.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def joined(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.select($"user_id".as("v_user"), $"ts".as("view_ts"))
      .withWatermark("view_ts", "30 minutes")
    val c = clicks.select($"user_id".as("c_user"), $"ts".as("click_ts"),
        $"value".as("click_value"))
      .withWatermark("click_ts", "30 minutes")
    v.join(c,
      $"v_user" === $"c_user" &&
        $"click_ts" > $"view_ts" &&
        $"click_ts" <= $"view_ts" + expr("INTERVAL 10 MINUTES"))
  }

  test("watermarked stream-stream interval join equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"event_type", $"value", $"ts")
    val rows = ev.as[(Long, String, Double, Timestamp)].collect().sortBy(_._4.getTime)

    val input = MemoryStream[(Long, String, Double, Timestamp)]
    val stream = input.toDF().toDF("user_id", "event_type", "value", "ts")
    val q = joined(
        stream.filter($"event_type" === "view"),
        stream.filter($"event_type" === "click"))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      // three uneven micro-batches, plus a far-future flush sentinel
      // (user_id -1 matches nothing) to push the watermark past the
      // last band so every pending pair is emitted
      val (a, rest) = rows.splitAt(rows.length / 3)
      val (b, c0) = rest.splitAt(rest.length / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      input.addData(c0: _*); q.processAllAvailable()
      val flush = new Timestamp(rows.last._4.getTime + 3600L * 1000)
      input.addData((-1L, "view", 0.0, flush)); q.processAllAvailable()
    } finally q.stop()

    def multiset(df: DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val got = multiset(spark.table("ss_join")
      .select($"v_user", $"view_ts", $"click_ts", $"click_value"))
    val want = multiset(joined(
        ev.filter($"event_type" === "view"),
        ev.filter($"event_type" === "click"))
      .select($"v_user", $"view_ts", $"click_ts", $"click_value"))
    assert(got === want)
    assert(got.nonEmpty)
  }
}
