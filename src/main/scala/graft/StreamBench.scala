package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{CandleTimeFrame, StockTransaction}
import graft.streaming.{CandleStream, StatefulCandles, TransactionSimulator}

/** Streaming-throughput bench — the stream-processor counterpart of
  * graft.Bench. The reference is a Kafka Streams app whose headline
  * number is sustained events/sec through the candle topology; this
  * main measures the Structured Streaming analogs end to end:
  *
  *   - windowed_minute:   simulator → watermark → minute OHLCV agg
  *     (CandleStream.candles — the reference's core topology,
  *     stream/CandlestickAggregator.kt:75-118)
  *   - kafka_shaped_minute: the same topology INCLUDING the byte
  *     payload boundary — txns serialized to the reference's JSON
  *     value bytes, parsed back (CandleStream.fromKafkaShaped), then
  *     aggregated. The closest offline stand-in for the full
  *     Kafka-in/Kafka-out path (JsonSerde both sides).
  *   - multi_tf:          all four timeframes unioned off one source
  *     (CandleStream.multiTimeframe — kt:119-186's four streams)
  *   - stateful_minute:   flatMapGroupsWithState custom state machine
  *     (StatefulCandles — emission-on-window-close semantics)
  *
  * Method: rate-micro-batch source (exactly N ticks × 5 symbols per
  * trigger, event time derived from tick id — deterministic batch
  * content and watermark march, machine-speed independent), noop
  * sink, WARM warmup batches discarded, throughput = Σ input rows /
  * Σ triggerExecution ms over the next KEEP batches. Per-batch
  * progress comes from the engine's own StreamingQueryProgress.
  *
  * Prints ONE JSON line:
  *   {"metric":"stream_events_per_sec","workloads":{name:
  *    {"events_per_sec":…,"source_rows_per_sec":…,"scans":…,
  *     "source_rows":…,"batches":…},…},"ticks_per_batch":…}
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ticks = sys.env.getOrElse("SPARK_GRAFT_STREAM_TICKS", "400000").toLong
    val warm = 3
    val keep = 6
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // event time must outrun a minute window per few batches so append
    // mode emits continuously: 2048 ticks/event-second ⇒ a 400k-tick
    // batch spans ~195s of event time (~3 minute-windows per symbol)
    def source(): DataFrame = TransactionSimulator.streamMicroBatch(spark, ticks)

    def measure(name: String, out: DataFrame): (String, Double, Long, Int) = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"streambench-$name").toString
      val q = out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .queryName(name)
        .start()
      try {
        val deadline = System.nanoTime() + 600L * 1000 * 1000 * 1000
        while ((Option(q.lastProgress).map(_.batchId).getOrElse(-1L))
            < (warm + keep).toLong && System.nanoTime() < deadline)
          Thread.sleep(100)
        val kept = q.recentProgress
          .filter(p => p.batchId >= warm && p.batchId < warm + keep)
        val rows = kept.map(_.numInputRows).sum
        val ms = kept.map(p =>
          Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L)).sum
        (name, if (ms == 0) 0.0 else rows * 1000.0 / ms, rows, kept.length)
      } finally q.stop()
    }

    // reference JSON value-payload roundtrip: serialize each txn the
    // way the reference's producer does, parse with the shipping
    // payload contract, aggregate
    def kafkaShaped(txns: DataFrame): DataFrame =
      CandleStream.fromKafkaShaped(txns.select(
        col("symbol").cast("binary").as("key"),
        to_json(struct(
          col("symbol"), col("price"), col("quantity"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("timestamp")))
          .cast("binary").as("value")))

    // The engine's numInputRows counts SOURCE rows: one row per tick,
    // BEFORE the ×5 symbol fan-out (each tick becomes 5 transactions,
    // the reference's one-event-per-symbol-per-tick shape), and
    // multiTimeframe scans the source once per timeframe so each tick
    // is counted 4×. events_per_sec is transactions ingested per
    // second — rows_per_sec × txnsPerTick ÷ scans — the number
    // comparable to the reference's events/sec.
    val txnsPerTick = TransactionSimulator.symbols.size
    val workloads: Seq[(String, Int, () => DataFrame)] = Seq(
      ("windowed_minute", 1,
        () => CandleStream.candles(source(), CandleTimeFrame.Minute)),
      ("kafka_shaped_minute", 1,
        () => CandleStream.candles(kafkaShaped(source()),
          CandleTimeFrame.Minute)),
      ("multi_tf", 4, () => CandleStream.multiTimeframe(source())),
      ("stateful_minute", 1,
        () => StatefulCandles.minuteCandles(
          source().as[StockTransaction]).toDF()))

    val results = workloads.map { case (name, fan, mk) =>
      (measure(name, mk()), fan)
    }
    val js = results.map { case ((n, rps, rows, batches), fan) =>
      "\"" + n + "\":{\"events_per_sec\":" + f"${rps * txnsPerTick / fan}%.0f" +
        ",\"source_rows_per_sec\":" + f"$rps%.0f" + ",\"scans\":" + fan +
        ",\"source_rows\":" + rows + ",\"batches\":" + batches + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_events_per_sec","workloads":$js,"ticks_per_batch":$ticks}""")
    spark.stop()
  }
}
