package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch progress capture — the operational metrics surface
  * a long-running deployment feeds to dashboards and lag alerts (the
  * Kafka Streams metrics-registry analog; reference deployments watch
  * consumer lag and process rate). A [[StreamingQueryListener]]
  * accumulates every batch's (query, batchId, input rows, process
  * rate, trigger wall-clock) in a driver-side buffer exposed as a
  * DataFrame — rows are tiny and bounded by batch count, never by
  * data volume.
  *
  * Usage: `val m = StreamMetrics.attach(spark)` before starting
  * queries; `m.frame()` any time; `StreamMetrics.detach(spark, m)`
  * when done (listeners outlive queries by design — one registry can
  * watch many).
  */
final class StreamMetrics private (spark: SparkSession)
    extends StreamingQueryListener {

  private val rows =
    mutable.ArrayBuffer.empty[(String, Long, Long, Double, Long)]

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    val p = e.progress
    rows += ((Option(p.name).getOrElse(p.id.toString), p.batchId,
      p.numInputRows,
      // empty batches report NaN; store 0 so aggregates stay sane
      if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)))
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Everything captured so far, one row per (query, micro-batch). */
  def frame(): DataFrame = synchronized {
    import spark.implicits._
    rows.toSeq.toDF("query", "batch_id", "input_rows", "rows_per_sec",
      "trigger_ms")
  }
}

object StreamMetrics {
  def attach(spark: SparkSession): StreamMetrics = {
    val m = new StreamMetrics(spark)
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: StreamMetrics): Unit =
    spark.streams.removeListener(m)
}
