package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

import graft.operators.Candles

/** The Spark 4 arbitrary-state streaming API (`transformWithState` +
  * `StatefulProcessor`, RocksDB-backed): a per-symbol running-volume
  * processor whose ValueState survives micro-batch boundaries. This
  * is the modern replacement for flatMapGroupsWithState (StatefulSpec
  * covers the classic API) — typed per-key state with explicit
  * encoders and TTL, the building block for custom streaming
  * operators Spark's windowed aggregates can't express. Answers must
  * equal the batch running sum regardless of where the batch cut
  * falls.
  */
object TransformWithStateSpec {
  // (symbol, price, quantity, ts) → (symbol, ts, running_volume)
  class RunningVolume
    extends StatefulProcessor[String, (String, Double, Int, Timestamp),
      (String, Timestamp, Long)] {
    @transient private var vol: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      vol = getHandle.getValueState[Long]("vol", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String,
                                 rows: Iterator[(String, Double, Int, Timestamp)],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
    : Iterator[(String, Timestamp, Long)] = {
      // event-time order within the micro-batch: arrival order inside
      // a batch is not deterministic, the emitted running sums must be
      val sorted = rows.toArray.sortBy(_._4.getTime)
      var v = if (vol.exists()) vol.get() else 0L
      val out = sorted.map { r => v += r._3; (key, r._4, v) }
      vol.update(v)
      out.iterator
    }
  }
}

class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState running volume equals the batch cumulative sum") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val txn = Candles.transactions(spark, "/root/testdata/sf0.001")
      // a batch cut mid-stream: state must carry symbol totals across it
      val rows = txn.select($"symbol", $"price", $"quantity", $"ts")
        .as[(String, Double, Int, Timestamp)].collect().sortBy(_._4.getTime)

      val input = MemoryStream[(String, Double, Int, Timestamp)]
      implicit val outEnc: Encoder[(String, Timestamp, Long)] =
        Encoders.tuple(Encoders.STRING, Encoders.TIMESTAMP, Encoders.scalaLong)
      val q = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new TransformWithStateSpec.RunningVolume,
          TimeMode.None, OutputMode.Append)
        .toDF("symbol", "ts", "running_volume")
        .writeStream.format("memory").queryName("tws_sink")
        .outputMode("append").start()
      try {
        input.addData(rows.take(rows.length / 2): _*); q.processAllAvailable()
        input.addData(rows.drop(rows.length / 2): _*); q.processAllAvailable()
      } finally q.stop()

      val got = spark.table("tws_sink").collect().map(_.toSeq).toSet
      val w = Window.partitionBy($"symbol").orderBy($"ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = txn
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
