package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.model.CandleTimeFrame
import graft.operators.Candles
import graft.streaming.CandleStream

/** Restart-from-checkpoint recovery — the operational property Kafka
  * Streams gives the reference for free via changelog topics
  * (reference: stream/CandlestickAggregator.kt:92-105, state stores
  * via `Materialized`): a streaming query killed mid-stream and
  * restarted against the same `checkpointLocation` must converge to
  * the batch answer, with the windowed / per-key state restored, not
  * rebuilt from zero.
  *
  * MemoryStream is not recoverable, so both cases stream from a file
  * source (new parquet part-files appended between runs — the
  * checkpoint's file log tracks what run 1 consumed) and stop() the
  * query at a batch boundary, the Structured Streaming equivalent of
  * a crash after the last commit.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def sortedTxns: Array[(String, Double, Int, Timestamp)] =
    Candles.transactions(spark, "/root/testdata/sf0.001")
      .select($"symbol", $"price", $"quantity", $"ts")
      .as[(String, Double, Int, Timestamp)]
      .collect().sortBy(_._4.getTime)

  private def asDf(rows: Seq[(String, Double, Int, Timestamp)]) =
    rows.toDF("symbol", "price", "quantity", "ts")

  private def writeFiles(rows: Seq[(String, Double, Int, Timestamp)],
                         dir: String): Unit =
    asDf(rows).coalesce(1).write.mode("append").parquet(dir)

  test("windowed candle agg restarted from checkpoint converges to the batch answer") {
    val src = Files.createTempDirectory("recover-src").toString
    val store = Files.createTempDirectory("recover-store").toString
    val chk = Files.createTempDirectory("recover-chk").toString

    val rows = sortedTxns
    // split mid-hour so the boundary window needs rows from BOTH runs:
    // a restart that loses the window state gets open/volume wrong for
    // that window, not just fewer rows. (Hour grain, not minute: at
    // sf0.001 every (symbol, minute) holds exactly one txn, so no
    // minute window can straddle a cut.) Pick the first cut past the
    // midpoint whose row continues a (symbol, hour) the prefix already
    // opened.
    def hourOf(r: (String, Double, Int, Timestamp)): Long = r._4.getTime / 3600000L
    val cut = (rows.length / 2 until rows.length).find { i =>
      var j = i - 1
      var found = false
      while (j >= 0 && hourOf(rows(j)) == hourOf(rows(i)) && !found) {
        if (rows(j)._1 == rows(i)._1) found = true
        j -= 1
      }
      found
    }.getOrElse(fail("no mid-window split point found in the data"))
    val (pre, post) = rows.splitAt(cut)
    assert(Candles.rollup(Candles.minuteCandles(asDf(pre.toSeq)), CandleTimeFrame.Hour)
      .filter(date_trunc("hour", lit(post.head._4)) === col("window_start") &&
        col("symbol") === post.head._1).count() === 1,
      "split must land mid-window for the recovery to be load-bearing")

    def startQuery() = CandleStream.upsertToStore(
      CandleStream.candles(
        spark.readStream
          .schema(asDf(pre.toSeq).schema)
          .parquet(src),
        CandleTimeFrame.Hour),
      store, chk)

    writeFiles(pre, src)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // "crash": q1 is gone; remaining data lands; a fresh query resumes
    // from the same checkpoint and must pick up exactly the new files
    writeFiles(post, src)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(store)
      .select(Candles.candleColumns: _*)
      .collect().map(_.toSeq).toSet
    val want = Candles.rollup(Candles.minuteCandles(asDf(rows.toSeq)), CandleTimeFrame.Hour)
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("full cascade restarted from checkpoint converges to the batch multi-timeframe answer") {
    val src = Files.createTempDirectory("cascade-recover-src").toString
    val store = Files.createTempDirectory("cascade-recover-store").toString
    val chk = Files.createTempDirectory("cascade-recover-chk").toString

    val rows = sortedTxns
    val (pre, post) = rows.splitAt(rows.length / 2)

    def startQuery() = CandleStream.cascadeToStore(
      CandleStream.candles(
        spark.readStream
          .schema(asDf(pre.toSeq).schema)
          .parquet(src),
        CandleTimeFrame.Minute),
      store, chk)

    writeFiles(pre, src)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    writeFiles(post, src)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    // the restarted run must process exactly the unconsumed files
    // (checkpoint file log) and re-roll every affected month: all four
    // timeframes equal the batch aggregation over everything
    val got = spark.read.parquet(store)
      .select(Candles.candleColumns: _*)
      .collect().map(_.toSeq).toSet
    val want = Candles.multiTimeframe(asDf(rows.toSeq))
      .select(Candles.candleColumns: _*)
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("flatMapGroupsWithState (StreamingLsh) restarted from checkpoint resumes bucket state") {
    import graft.streaming.StreamingLsh
    val src = Files.createTempDirectory("lsh-recover-src").toString
    val out = Files.createTempDirectory("lsh-recover-out").toString
    val chk = Files.createTempDirectory("lsh-recover-chk").toString

    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val (pre, post) = docs.splitAt(docs.length / 2)
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)

    def startQuery() = StreamingLsh.candidatePairs(
      spark.readStream
        .schema(pre.toDF("doc_id", "text").schema)
        .parquet(src))
      .toDF()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()

    write(pre)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    write(post)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    // pairs between a pre-crash doc and a post-restart doc exist ONLY
    // if the restarted query restored the bucket member lists
    val got = spark.read.parquet(out).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.operators.LshDedup.minhashCandidates(
      docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    val preIds = pre.map(_._1).toSet
    val postIds = post.map(_._1).toSet
    assert(got.exists { case (a, b) =>
      (preIds(a) && postIds(b)) || (postIds(a) && preIds(b)) },
      "no pair spans the crash; bucket-state restore is untested")
  }

  test("transformWithState (RocksDB) restarted from checkpoint resumes per-key state") {
    val src = Files.createTempDirectory("tws-recover-src").toString
    val out = Files.createTempDirectory("tws-recover-out").toString
    val chk = Files.createTempDirectory("tws-recover-chk").toString

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = sortedTxns
      val (pre, post) = rows.splitAt(rows.length / 2)

      // per-key running volume: the suffix's sums are only right if the
      // restarted query restored every symbol's ValueState from RocksDB
      def startQuery() = {
        implicit val outEnc = org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.TIMESTAMP,
          org.apache.spark.sql.Encoders.scalaLong)
        spark.readStream
          .schema(asDf(pre.toSeq).schema)
          .parquet(src)
          .as[(String, Double, Int, Timestamp)]
          .groupByKey(_._1)
          .transformWithState(new TransformWithStateSpec.RunningVolume,
            TimeMode.None, OutputMode.Append)
          .toDF("symbol", "ts", "running_volume")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", chk)
          .outputMode("append").start()
      }

      writeFiles(pre, src)
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      writeFiles(post, src)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(out).collect().map(_.toSeq).toSet
      val w = Window.partitionBy($"symbol").orderBy($"ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = asDf(rows.toSeq)
        .select($"symbol", $"ts",
          sum($"quantity").over(w).cast("long").as("running_volume"))
        .collect().map(_.toSeq).toSet
      assert(got === want)
      assert(got.size === rows.length)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
