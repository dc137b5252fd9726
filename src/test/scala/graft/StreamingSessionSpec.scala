package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** SURVEY §2 claims session_window is "batch + streaming capable" —
  * this proves the streaming half: the same gap-based session
  * aggregation over a MemoryStream (watermark + append mode) emits
  * sessions identical to the batch computation once the watermark
  * passes them. Sessions only finalize when the watermark clears
  * session end + gap, so a late high-ts sentinel closes the earlier
  * windows — exactly how a live pipeline drains.
  */
class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming session_window emits batch-identical sessions once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0), // same session (10 min gap)
      (1L, ts("2024-01-01 11:00:00"), 3.0), // 50 min gap → new session
      (2L, ts("2024-01-01 10:05:00"), 4.0))
    // watermark-advancing sentinel, far past every session end + gap
    val sentinel = (9L, ts("2024-01-02 00:00:00"), 0.0)

    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(38,2)")
          .cast("double").as("total_value"))
      .select(col("user_id"), col("w.start").as("s"), col("w.end").as("e"),
        col("n_events"), col("total_value"))

    val input = MemoryStream[(Long, Timestamp, Double)]
    val stream = sessions(
      input.toDF().toDF("user_id", "ts", "value").withWatermark("ts", "1 minute"))
    val q = stream.writeStream.format("memory")
      .queryName("stream_sessions").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(sentinel)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    val want = sessions(rows.toDF("user_id", "ts", "value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    // every pre-sentinel session must have been emitted, identically
    assert(want.subsetOf(got), s"missing sessions: ${want -- got}")
    // and nothing extra beyond the sentinel's own (possibly unemitted)
    assert((got -- want).forall(_._1 == 9L), s"unexpected rows: ${got -- want}")
    assert(want.size === 3) // user 1: two sessions; user 2: one
  }
}
