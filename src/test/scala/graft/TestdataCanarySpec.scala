package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-drift canary: fails in seconds, loudly, if the driver
  * regenerates `/root/testdata` with a `ts` encoding the loaders
  * mishandle. Round 5 shipped 55 broken queries because the events
  * loader hardcoded the TIMESTAMP(NANOS)-as-long encoding while the
  * regenerated data carried TIMESTAMP(MICROS): the batch path crashed
  * at analysis and the streaming path silently read µs as raw longs,
  * landing every window in 1970. These asserts make either failure
  * mode (crash OR silent epoch shift) a red test immediately.
  */
class TestdataCanarySpec extends SparkSpec {
  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("batch events ts lands in the generated-data year, every sf") {
    for (dir <- sfDirs) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"$dir: loader must normalize ts to TimestampType")
      val Array(yMin, yMax, n) = df
        .agg(min(year(col("ts"))), max(year(col("ts"))), count(lit(1)))
        .collect()(0).toSeq.map(_.toString.toLong).toArray
      assert(n > 0, s"$dir: events is empty")
      // generator writes 2024 data; a unit mix-up lands in 1970 (µs
      // read as ms) or far future (ns read as µs) — both out of range
      assert(yMin >= 2020 && yMax <= 2030,
        s"$dir: events ts years [$yMin,$yMax] outside sane range — " +
          "ts encoding drifted under the loader")
    }
  }

  test("streaming events read agrees with the batch read bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir)
      .agg(min("ts").as("mn"), max("ts").as("mx"), count(lit(1)).as("n"))
      .collect()(0)
    val streamed = streamToBatch(Tables.eventsStream(spark, dir))
    val got = streamed
      .agg(min("ts").as("mn"), max("ts").as("mx"), count(lit(1)).as("n"))
      .collect()(0)
    assert(got == batch,
      s"stream (min,max,count)=$got diverged from batch $batch — " +
        "the stream schema is not derived from the same probe")
  }

  /** Run a file-source stream to completion into an in-memory table. */
  private def streamToBatch(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val name = s"canary_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
