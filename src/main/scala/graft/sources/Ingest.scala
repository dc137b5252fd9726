package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Malformed-input policy for text-format ingest: at corpus scale a
  * bad producer WILL ship garbage lines, and the job must neither die
  * (FAILFAST) nor silently null them out (plain PERMISSIVE with no
  * corrupt column). Rows parse in PERMISSIVE mode with the raw text of
  * every unparseable line captured in a quarantine column; [[good]] /
  * [[quarantined]] split the frame so clean rows flow on while the
  * originals of the bad ones land in a reviewable side table (the
  * badRecordsPath pattern, engine-portable).
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  /** JSON-lines read with corrupt-line capture. The returned frame is
    * EAGERLY persisted: Spark (rightly) refuses queries that filter
    * only on the corrupt column of a lazily re-parsed scan (the
    * internal-column pushdown would change answers), so the parse is
    * materialized once and both splits read the same snapshot. Callers
    * unpersist when done routing.
    */
  def jsonWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): DataFrame =
    readWithQuarantine(spark, schema)(_.json(path))

  /** CSV sibling — same contract as [[jsonWithQuarantine]]. */
  def csvWithQuarantine(spark: SparkSession, path: String,
                        schema: StructType): DataFrame =
    readWithQuarantine(spark, schema)(_.option("header", "false").csv(path))

  private def readWithQuarantine(spark: SparkSession, schema: StructType)(
      load: org.apache.spark.sql.DataFrameReader => DataFrame): DataFrame = {
    val df = load(spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol))
      .persist()
    df.count()
    df
  }

  /** Rows that parsed cleanly, corrupt column dropped. */
  def good(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The raw text of every unparseable line — the reviewable
    * quarantine table.
    */
  def quarantined(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_record"))
}
