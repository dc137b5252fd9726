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
    // the chaos hook is a no-op unless the session opted into the
    // retry-determinism gate (graft.Chaos scaladoc; default off)
    graft.Chaos.maybeInject(spark.read.parquet(s"$dir/$name.parquet"))

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame =
    maybeSample(load(spark, dir, "documents"), "doc_id")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    maybeSample(load(spark, dir, "embeddings"), "vec_id")

  /** Sampled-cohort gate hook (default off): when the session sets
    * `graft.sample.idMod` = k, the corpus tables restrict to the
    * deterministic cohort id % k == 0 — IN BOTH ENGINES (tools/
    * check_ckpt.py --sample-mod redefines the DuckDB views with the
    * same predicate), so a big-SF compare whose ORACLE is
    * quadratic/memory-infeasible at full width can still value-check
    * the engine end to end on the big-SF files: the scan, layout and
    * whole operator chain run for real, only the cohort shrinks.
    * Plain modulus deliberately (not a hash): doc_ids are already
    * uncorrelated with dup-cluster membership (GenData seeds point at
    * pmod(xxhash64, id) — random earlier ids), and `id % k` is
    * trivially identical in any engine. The driver never sets the
    * conf; the 173-key contract is unchanged.
    */
  private def maybeSample(df: DataFrame, idCol: String): DataFrame = {
    val mod = df.sparkSession.conf.get("graft.sample.idMod", "")
    if (mod.isEmpty) df
    else df.filter(pmod(col(idCol), lit(mod.toLong)) === 0L)
  }

  /** The driver has shipped `events.parquet` with two different `ts`
    * encodings across regenerations: TIMESTAMP(NANOS) (which Spark's
    * vectorized reader only accepts as a raw long via
    * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS)
    * (which Spark reads as TIMESTAMP_NTZ — the annotation carries
    * isAdjustedToUTC=false). Hardcoding either breaks when the data is
    * regenerated with the other, so the loader adapts to the FOOTER
    * schema (probed directly via parquet-hadoop, before Spark's own
    * inference would reject a NANOS column) and always yields
    * TimestampType `ts` carrying the file's wall-clock read as UTC.
    *
    * Session confs: the loader pins spark.sql.session.timeZone=UTC —
    * that is the library's documented timestamp contract (every
    * window / date_trunc / oracle comparison downstream assumes it),
    * and leaving it implicit meant a caller with a local-TZ session
    * got silently shifted instants. nanosAsLong is set ONLY when the
    * footer actually carries TIMESTAMP(NANOS), where the read cannot
    * succeed without it (the conf is consulted at execution, not just
    * inference, so it must stay set for the query lifetime); against
    * today's MICROS files the loader no longer touches it.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    prepareEventsSession(spark, s"$dir/events.parquet")
    normalizeEventsTs(load(spark, dir, "events"))
  }

  /** Pin the UTC contract; enable the legacy nanos read path only
    * when this events file actually needs it (see [[events]]).
    */
  private def prepareEventsSession(spark: SparkSession, path: String): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if (eventsTsIsNanos(spark, path))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  /** Footer probe: does `ts` carry a TIMESTAMP(NANOS) annotation?
    * Reads one file's parquet footer via parquet-hadoop — Spark's own
    * schema inference can't answer this, because without nanosAsLong
    * it throws on the very column we're probing for.
    */
  private def eventsTsIsNanos(spark: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file: Option[Path] =
      if (!fs.exists(p)) None
      else if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
          .sortBy(_.getName).headOption
      else Some(p)
    file.exists { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.containsField("ts") &&
          (schema.getType(Seq("ts"): _*).getLogicalTypeAnnotation match {
            case t: TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          })
      } finally reader.close()
    }
  }

  /** Normalize `ts` to TimestampType whatever the on-disk encoding.
    *
    * LongType = raw epoch nanos (nanosAsLong path): truncate to µs
    * with INTEGER division — epoch nanos exceed 2^53, so a
    * double-typed floor(ns/1000.0) would be off by ±1µs — matching
    * DuckDB's `epoch_ns(ts) // 1000` bit-for-bit.
    *
    * TIMESTAMP_NTZ = wall-clock micros: under the UTC session zone
    * the loader itself pins (prepareEventsSession), the cast re-tags
    * the same instant.
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
    // same sampled-cohort + chaos hooks as the batch loader, so the
    // stream-vs-batch parity queries stay parity under --sample-mod
    // and the retry gate covers stateful micro-batch recovery
    graft.Chaos.maybeInject(maybeSample(
      spark.readStream.schema(documents(spark, dir).schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir),
      "doc_id"))

  /** The embeddings table as a file-source stream (the
    * vectors-arriving-with-the-corpus shape the streaming drift
    * monitor consumes). Same schema-from-batch-footer and
    * sample/chaos hooks as [[documentsStream]].
    */
  def embeddingsStream(spark: SparkSession, dir: String): DataFrame =
    graft.Chaos.maybeInject(maybeSample(
      spark.readStream.schema(embeddings(spark, dir).schema)
        .option("pathGlobFilter", "embeddings.parquet").parquet(dir),
      "vec_id"))

  /** Streaming read of the same events table (file source). Schema
    * must be supplied for streams — we derive it from the batch file's
    * footer so the two paths can never diverge. (An explicit `ts:
    * LongType` here once read a regenerated MICROS file's values as
    * raw longs: `div 1000` turned µs into ms and every window landed
    * in 1970 — a silently-wrong answer, not a crash.)
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    prepareEventsSession(spark, s"$dir/events.parquet")
    val probed = load(spark, dir, "events").schema
    // the file stream source wants a directory; glob-filter to the one
    // table. Chaos hook on the STREAM too (no-op unless opted in):
    // stateful micro-batch recovery — a failed attempt's state-store
    // changes must be discarded and the retry must commit identical
    // state — is the streaming half of the retry-determinism gate.
    normalizeEventsTs(graft.Chaos.maybeInject(
      spark.readStream.schema(probed)
        .option("pathGlobFilter", "events.parquet").parquet(dir)))
  }
}
