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

  /** End-to-end quarantine certification on REAL file drops built from
    * a documents frame (`doc_id long, source string, text string`): a
    * zstd-jsonl drop where every `doc_id % 50 == 0` line is garbage and
    * a gzip-csv drop where every `doc_id % 71 == 0` row carries an
    * unparseable numeric; both are re-read through the PERMISSIVE
    * quarantine and reduced to one row of eight closed-form aggregates.
    * The corruption rule is a pure function of `doc_id` and both
    * bad-line shapes are deterministic strings, so the aggregates are
    * reproducible from the input frame alone — by the DuckDB oracle
    * (SparkEntry) and by the closed-form hostile-corpus spec
    * (IngestHostileSpec), which feeds text with embedded newlines,
    * quotes, commas, backslashes, non-BMP pairs, empty and NULL values.
    *
    * Hostile-text audit (why each aggregate is roundtrip-stable):
    *  - jsonl good lines are `to_json` output: Jackson escapes every
    *    control char (so no raw line break survives into the file) and
    *    emits non-ASCII/non-BMP raw UTF-8, which `read.json` restores
    *    byte-exactly. `length` counts CODE POINTS in both Spark
    *    (`UTF8String.numChars`) and DuckDB, so non-BMP text agrees too
    *    (the spec asserts against `codePointCount`, not Java
    *    `String.length` UTF-16 units).
    *  - NULL text: `to_json` drops the field (ignoreNullFields
    *    default), the parsed row carries text=NULL, and `sum(length)`
    *    skips it on both sides.
    *  - the csv drop never carries `text` — only its LENGTH — so
    *    quotes/commas/newlines in text cannot corrupt csv framing. A
    *    NULL length is written as an explicit empty second field
    *    (`"<id>,"`): a bare `concat` would turn the whole line NULL,
    *    Spark's text writer would emit an EMPTY line, and the csv
    *    reader silently skips blank lines — the row would vanish from
    *    `n_csv_good` while a count-based oracle still counts it (the
    *    round-12 driver-divergence class this function closes).
    *
    * Precondition: `doc_id` is non-NULL (it keys the corruption rule;
    * a NULL id cannot be classified by either side).
    *
    * Content-addressable diagnostics: `json_quarantine_fp` /
    * `csv_quarantine_fp` are order-independent fingerprints over the
    * EXACT BYTES of the quarantined raw records — Σ over records of
    * the first 15 hex chars of md5(raw) as a 60-bit integer (sum of
    * per-record hashes, so no sort/collect is needed and the value is
    * partition-order-free). The quarantined records are pure
    * functions of doc_id, so the oracle recomputes the same
    * fingerprint from the parquet table alone. If a driver-side
    * divergence ever reappears, the fingerprint discriminates in one
    * bit: fp equal but counts/lengths differ ⇒ the PARSE SPLIT
    * differs; fp differs ⇒ the file ROUNDTRIP content differs.
    */
  def quarantineRoundtrip(spark: SparkSession, docs: DataFrame,
                          tmpDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    ZstdJniCodec.register(spark)
    docs.select(when(pmod(col("doc_id"), lit(50L)) === 0L,
          concat(lit("{corrupt drop line for doc "),
            col("doc_id").cast("string")))
        .otherwise(to_json(struct(col("doc_id"), col("source"), col("text"))))
        .as("value"))
      .write.option("compression", classOf[ZstdJniCodec].getName)
      .text(s"$tmpDir/jsonl")
    docs.select(when(pmod(col("doc_id"), lit(71L)) === 0L,
          concat(col("doc_id").cast("string"), lit(",notanumber")))
        .otherwise(concat(col("doc_id").cast("string"), lit(","),
          coalesce(length(col("text")).cast("string"), lit(""))))
        .as("value"))
      .write.option("compression", "gzip")
      .text(s"$tmpDir/csv")
    val jsonSchema = new StructType()
      .add("doc_id", LongType).add("source", StringType)
      .add("text", StringType)
    val jp = jsonWithQuarantine(spark, s"$tmpDir/jsonl", jsonSchema)
    val csvSchema = new StructType()
      .add("doc_id", LongType).add("n", LongType)
    val cp = csvWithQuarantine(spark, s"$tmpDir/csv", csvSchema)
    // jp/cp stay persisted until the session drops them: the quarantine
    // split MUST read the materialized parse (scaladoc above), and the
    // returned frame is still lazy
    good(jp).agg(
        count(lit(1)).as("n_json_good"),
        sum(col("doc_id")).as("sum_json_good_ids"),
        sum(length(col("text"))).as("sum_json_good_text_len"))
      .crossJoin(quarantined(jp).agg(
        count(lit(1)).as("n_json_quarantined"),
        sum(length(col("raw_record"))).as("sum_json_quarantined_len"),
        recordFingerprint(col("raw_record")).as("json_quarantine_fp")))
      .crossJoin(good(cp).agg(
        count(lit(1)).as("n_csv_good"),
        sum(col("n")).as("sum_csv_good_n")))
      .crossJoin(quarantined(cp).agg(
        count(lit(1)).as("n_csv_quarantined"),
        sum(length(col("raw_record"))).as("sum_csv_quarantined_len"),
        recordFingerprint(col("raw_record")).as("csv_quarantine_fp")))
  }

  /** Order-independent content fingerprint:
    * (Σ h(rec)) mod 2⁶¹ where h = the first 15 hex chars of md5(rec)
    * as a 60-bit integer. md5 and the hex prefix are engine-portable
    * (DuckDB: `('0x'||h)::BIGINT`); summing per-record hashes needs
    * no global sort or collect. The sum runs EXACT in DECIMAL(38,0)
    * (HUGEINT on the oracle — a plain Long sum would WRAP on Spark
    * but RAISE on DuckDB past ~8 records, the precise
    * silent-divergence class this fingerprint exists to catch), then
    * reduces mod 2⁶¹ so the emitted column is a plain BIGINT on both
    * engines. Exact to ~10²⁰ records.
    */
  private def recordFingerprint(rec: org.apache.spark.sql.Column) = {
    val h = conv(substring(md5(rec), 1, 15), 16, 10)
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))
    coalesce(pmod(sum(h), lit(1L << 61)).cast("long"), lit(0L))
  }
}
