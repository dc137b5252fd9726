package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming exact dedup keeps the first arrival of each normalized content") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val deduped = Dedup.dropExactDuplicatesStream(docs, "ts", "1 hour")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_sink").outputMode("append").start()
    try {
      input.addData(
        (1L, "Same Text here", ts("2024-01-01 10:00:00")),
        (2L, "same   text HERE", ts("2024-01-01 10:00:10")), // normalized dup of 1
        (3L, "different text", ts("2024-01-01 10:00:20")))
      q.processAllAvailable()
      // a later batch re-sends the same content within the watermark
      input.addData(
        (4L, "SAME TEXT HERE", ts("2024-01-01 10:30:00")), // still a dup
        (5L, "brand new words", ts("2024-01-01 10:30:10")))
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.table("dedup_sink").select("doc_id").as[Long].collect().toSet
    // exactly one representative of the {1,2,4} content survives (which
    // of 1/2 wins inside the first micro-batch is partition-order
    // dependent); 4 arrived in a later batch so it can never win
    assert((kept & Set(1L, 2L)).size === 1)
    assert(!kept.contains(4L))
    assert(kept.contains(3L) && kept.contains(5L))
    assert(kept.size === 3)
  }
}
