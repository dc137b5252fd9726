package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated TPC-H-ish test set.
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters
  * and prunes columns into the scan, so callers should NOT pre-cache
  * or pre-collect; compose lazily and let the optimizer do pruning.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** The driver has shipped `events.parquet` with two different `ts`
    * encodings across regenerations: TIMESTAMP(NANOS) (which Spark's
    * vectorized reader only accepts as a raw long via
    * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS)
    * (which Spark reads as TIMESTAMP_NTZ — the annotation carries
    * isAdjustedToUTC=false). Hardcoding either breaks when the data is
    * regenerated with the other, so the loader adapts to the footer
    * schema and always yields session-TZ TimestampType `ts`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The conf must stay set for the whole query lifetime (the scan
    // consults it at execution, not just schema inference); it only
    // affects TIMESTAMP(NANOS) columns, which no other table has, and
    // is a no-op against a MICROS file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(spark, dir, "events"))
  }

  /** Normalize `ts` to TimestampType whatever the on-disk encoding.
    *
    * LongType = raw epoch nanos (nanosAsLong path): truncate to µs
    * with INTEGER division — epoch nanos exceed 2^53, so a
    * double-typed floor(ns/1000.0) would be off by ±1µs — matching
    * DuckDB's `epoch_ns(ts) // 1000` bit-for-bit.
    *
    * TIMESTAMP_NTZ = wall-clock micros: with the UTC session zone
    * every entry point sets, the cast re-tags the same instant.
    */
  private def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  /** The documents table as a file-source stream (ingest-shaped:
    * corpus batches arriving as files). The required explicit schema
    * is probed from the batch footer — same no-divergence rule as
    * eventsStream.
    */
  def documentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documents(spark, dir).schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)

  /** Streaming read of the same events table (file source). Schema
    * must be supplied for streams — we derive it from the batch file's
    * footer so the two paths can never diverge. (An explicit `ts:
    * LongType` here once read a regenerated MICROS file's values as
    * raw longs: `div 1000` turned µs into ms and every window landed
    * in 1970 — a silently-wrong answer, not a crash.)
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val probed = load(spark, dir, "events").schema
    // the file stream source wants a directory; glob-filter to the one table
    normalizeEventsTs(
      spark.readStream.schema(probed)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
  }
}
