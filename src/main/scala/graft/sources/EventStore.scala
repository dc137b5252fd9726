package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned raw event storage — the ingest layout the 100-TB
  * deployment needs: the driver's single events.parquet stands in for
  * a day-partitioned event lake; this writer/reader pair shows the
  * real layout and proves its pruning.
  *
  * Layout: `event_date=YYYY-MM-DD/part-*.parquet`, rows sorted by ts
  * within files (tight row-group min/max stats). Time-range queries
  * prune to the covered date directories (partition pruning) and then
  * to row groups (stats pruning) — a day's query touches a day's
  * bytes, regardless of corpus size.
  */
object EventStore {

  def write(events: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .sortWithinPartitions(col("ts"))
      .write.mode(mode)
      .partitionBy("event_date")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** [from, to) time-range scan; the date predicate prunes partitions,
    * the ts predicate prunes row groups.
    */
  def readRange(spark: SparkSession, path: String,
                from: String, to: String): DataFrame =
    read(spark, path)
      .filter(col("event_date") >= to_date(lit(from)) &&
        col("event_date") <= to_date(lit(to)) &&
        col("ts") >= to_timestamp(lit(from)) &&
        col("ts") < to_timestamp(lit(to)))

  /** The distinct event dates present in the store, answered from the
    * partition directory listing (a metadata-only scan: the date is a
    * partition column, so no data files are read).
    */
  def dates(spark: SparkSession, path: String): DataFrame =
    read(spark, path).select(col("event_date")).distinct()
}
