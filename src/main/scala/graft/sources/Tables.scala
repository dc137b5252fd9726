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

  /** `events` carries parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as raw
    * longs (spark.sql.legacy.parquet.nanosAsLong) and truncate to
    * microsecond TimestampType with INTEGER division (`div`) — epoch
    * nanos exceed 2^53, so a double-typed floor(ns/1000.0) would be
    * off by ±1µs — matching DuckDB's `make_timestamp(epoch_ns(ts) //
    * 1000)` bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The conf must stay set for the whole query lifetime (the scan
    // consults it at execution, not just schema inference); it only
    // affects TIMESTAMP(NANOS) columns, which no other table has.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** The documents table as a file-source stream (ingest-shaped:
    * corpus batches arriving as files).
    */
  def documentsStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** Streaming read of the same events table (file source). Schema
    * must be supplied for streams; ts arrives as raw nanos (see
    * events() above) and gets the identical ns→µs truncation.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // the file stream source wants a directory; glob-filter to the one table
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
