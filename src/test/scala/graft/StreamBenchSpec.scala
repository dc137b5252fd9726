package graft

import org.apache.spark.sql.functions._

import graft.streaming.TransactionSimulator

/** The throughput bench is only meaningful if its source is
  * deterministic: rate-micro-batch emits exactly ticksPerBatch ticks
  * per trigger and event time is a pure function of the tick id, so
  * two runs measure the same work.
  */
class StreamBenchSpec extends SparkSpec {

  private def firstBatches(nBatches: Int): Array[org.apache.spark.sql.Row] = {
    val src = TransactionSimulator.streamMicroBatch(
      spark, ticksPerBatch = 1000L, ticksPerEventSecond = 100L)
    val name = s"smb_sink_${System.nanoTime()}"
    val q = src.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (Option(q.lastProgress).map(_.batchId).getOrElse(-1L) < nBatches
          && System.nanoTime() < deadline)
        Thread.sleep(50)
      // bound to the first nBatches ticks regardless of how many extra
      // triggers fired before stop
      spark.table(name)
        .filter(col("ts") < timestamp_seconds(
          lit(1704067200L) + lit(nBatches * 1000L / 100L)))
        .orderBy("ts", "symbol").collect()
    } finally q.stop()
  }

  test("streamMicroBatch: deterministic batches, 5 txns per tick, fixed event-time march") {
    val a = firstBatches(2)
    val b = firstBatches(2)
    assert(a.length === 2 * 1000 * 5, "2 batches x 1000 ticks x 5 symbols")
    assert(a.toSeq === b.toSeq, "two runs must produce identical rows")
    val syms = a.map(_.getString(0)).toSet
    assert(syms === TransactionSimulator.symbols.map(_._1).toSet)
    // event time: tick t lands at startEpoch + t/100 s — 2000 ticks
    // span exactly [0, 20s)
    val tsMin = a.map(_.getTimestamp(3).getTime).min
    val tsMax = a.map(_.getTimestamp(3).getTime).max
    assert(tsMin === 1704067200000L)
    assert(tsMax === 1704067200000L + 19990L)
  }
}
