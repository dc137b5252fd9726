package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * payloads with typed metadata, processed by per-partition batch
  * decoders.
  *
  * The decode itself is STUBBED (no codec libraries in this
  * environment — see decodeBatch below); everything around it is the
  * real design: schema (binary payload + metadata struct), partition-
  * batched iteration (the Scala analog of a Pandas-UDF batch: the
  * decoder amortizes per-batch setup, never materializes a whole
  * partition), and driver-checkable deterministic outputs.
  *
  * Scale notes: payloads never shuffle — features are extracted in the
  * scan stage and only the (tiny) feature rows move. Real deployments
  * put payloads in their own parquet column so predicate-only queries
  * never read the blob pages (columnar pruning does the work).
  */
object Media {

  /** A multimodal row: opaque payload + typed metadata. */
  final case class MediaRow(
      doc_id: Long, mime: String, width: Int, height: Int,
      payload: Array[Byte])

  /** Extracted features (the decoder output contract). */
  final case class MediaFeatures(
      doc_id: Long, mime: String, width: Int, height: Int,
      n_bytes: Int, mean_byte: Double)

  /** Synthesize a media table from documents: payload = UTF-8 bytes
    * (stand-in for encoded pixels), metadata derived deterministically
    * — the shape a real ingest (S3 blob + EXIF parse) would produce.
    */
  def packMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image/fake").as("mime"),
      (lit(64) + pmod(col("doc_id") * 7919 + length(col("text")), lit(512)))
        .cast("int").as("width"),
      (lit(64) + pmod(col("doc_id") * 104729 + length(col("text")), lit(512)))
        .cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched decode/feature-extract. Batches of `batchSize` rows are
    * processed together (amortizing decoder setup the way a Pandas UDF
    * batch or a GPU decode batch would).
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(decodeBatch)
    }.toDF()
  }

  /** ==== STUB BOUNDARY ====================================================
    * A real implementation decodes payloads with an image/audio codec
    * (e.g. javax.imageio / ffmpeg bindings) and emits pixel/sample
    * statistics. None of those libraries exist in this container, so
    * the "decode" is a deterministic fake: byte-level statistics of
    * the payload. The batch signature — Seq[MediaRow] ⇒
    * Seq[MediaFeatures] — is exactly what a codec-backed version
    * would implement.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val n = r.payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (r.payload(i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      MediaFeatures(r.doc_id, r.mime, r.width, r.height, n, mean)
    }

  /** "Video frame" sampling: split the payload into fixed-size chunks
    * and keep every `stride`-th — the partition-parallel shape of
    * frame extraction (explode stays in the scan stage; only sampled
    * frames survive).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32,
                   stride: Int = 4): DataFrame =
    media.select(col("doc_id"), posexplode(
      transform(
        sequence(lit(0),
          greatest(floor((octet_length(col("payload")) - 1) / frameBytes), lit(0)).cast("int")),
        i => substring(col("payload"), i * frameBytes + 1, lit(frameBytes)))))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame"))
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)
}
