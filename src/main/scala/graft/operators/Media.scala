package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * payloads, processed by per-partition batch decoders.
  *
  * The metadata decode is REAL: [[parseImageHeader]] reads PNG IHDR,
  * JPEG SOF and GIF logical-screen headers byte-for-byte from the
  * payload (pure JVM, no codec library), so `decodeFeatures` emits
  * parsed mime/width/height — not trusted sidecar metadata. Only the
  * PIXEL decode (inflate/IDCT to samples) would need a codec; the
  * feature contract degrades gracefully to byte statistics there.
  *
  * Scale notes: payloads never shuffle — features are extracted in the
  * scan stage and only the (tiny) feature rows move. Real deployments
  * put payloads in their own parquet column so predicate-only queries
  * never read the blob pages (columnar pruning does the work).
  */
object Media {

  /** A multimodal row: id + opaque payload. */
  final case class MediaBlob(doc_id: Long, payload: Array[Byte])

  /** Extracted features (the decoder output contract): header-parsed
    * mime/width/height, total payload size, mean byte of the BODY
    * (payload after the parsed header — the encoded sample stream).
    */
  final case class MediaFeatures(
      doc_id: Long, mime: String, width: Int, height: Int,
      n_bytes: Int, mean_byte: Double)

  private def be32hex(x: Column): Column = lpad(hex(x), 8, "0")
  private def be16hex(x: Column): Column = lpad(hex(x), 4, "0")
  private def le16hex(x: Column): Column =
    concat(lpad(hex(pmod(x, lit(256))), 2, "0"),
      lpad(hex(floor(x / 256).cast("int")), 2, "0"))

  /** Synthesize a media table from documents: payload = a REAL image
    * header (PNG / JPEG / GIF round-robin by doc_id, with genuine
    * byte layouts — the PNG even carries its correct IHDR CRC via
    * Spark's crc32) followed by the UTF-8 text bytes standing in for
    * the encoded sample stream. Width/height are derived
    * deterministically so an external oracle can recompute them — and
    * the gate then proves decodeFeatures PARSES them back out of the
    * bytes. Header construction is all native expressions (hex/lpad/
    * unhex/concat): it runs at scan speed, no UDF.
    */
  def packMediaImages(docs: DataFrame): DataFrame = {
    val w = (lit(64) + pmod(col("doc_id") * 7919 + length(col("text")), lit(512)))
      .cast("int")
    val h = (lit(64) + pmod(col("doc_id") * 104729 + length(col("text")), lit(512)))
      .cast("int")
    // PNG: 8-byte signature, IHDR length 13, type+data, CRC32 of
    // type+data (a strict PNG reader accepts this header)
    val ihdrHex = concat(lit("49484452"), be32hex(w), be32hex(h), lit("0802000000"))
    val pngHex = concat(lit("89504E470D0A1A0A0000000D"), ihdrHex,
      be32hex(crc32(unhex(ihdrHex))))
    // JPEG: SOI, then a single SOF0 segment (len 17: precision 8,
    // height, width, 3 components with standard sampling/qtables)
    val jpegHex = concat(lit("FFD8FFC0001108"), be16hex(h), be16hex(w),
      lit("03012200021101031101"))
    // GIF89a: signature + little-endian logical screen w/h + GCT
    // flags, background index, aspect
    val gifHex = concat(lit("474946383961"), le16hex(w), le16hex(h), lit("F70000"))
    val hdrHex = when(pmod(col("doc_id"), lit(3)) === 0, pngHex)
      .when(pmod(col("doc_id"), lit(3)) === 1, jpegHex)
      .otherwise(gifHex)
    docs.select(col("doc_id"),
      concat(unhex(hdrHex), encode(col("text"), "UTF-8")).as("payload"))
  }

  /** Opaque-blob synthesis (payload = raw text bytes, no header) —
    * the content-addressable-dedup and frame-sampling input shape,
    * where payloads are treated as uninterpreted bytes.
    */
  def packMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Batched decode/feature-extract. Batches of `batchSize` rows are
    * processed together (amortizing decoder setup the way a Pandas UDF
    * batch or a GPU decode batch would). Runs in the scan stage; only
    * feature rows survive.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob]
      .mapPartitions { rows => rows.grouped(batchSize).flatMap(decodeBatch) }
      .toDF()
  }

  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse an image header from raw bytes: (mime, width, height,
    * header length). Pure JVM — PNG IHDR (first chunk, per spec),
    * JPEG SOF0-15 via marker scan (skipping non-frame segments and
    * standalone markers), GIF87a/89a logical screen descriptor.
    * None when the bytes are not a recognized image.
    */
  private[graft] def parseImageHeader(p: Array[Byte])
      : Option[(String, Int, Int, Int)] = {
    if (p.length >= 33 && p.take(8).sameElements(pngSig)) {
      // IHDR is mandatory-first: length at 8, type at 12
      val ihdrLen = be32(p, 8)
      val isIhdr = p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R'
      if (isIhdr && ihdrLen == 13)
        Some(("image/png", be32(p, 16), be32(p, 20), 8 + 4 + 4 + 13 + 4))
      else None
    } else if (p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < p.length) {
        if ((p(i) & 0xff) != 0xff) return None // not a marker: corrupt
        val m = p(i + 1) & 0xff
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else {
          val len = be16(p, i + 2)
          val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (i + 8 >= p.length) return None
            return Some(("image/jpeg", be16(p, i + 7), be16(p, i + 5), i + 2 + len))
          }
          if (len < 2) return None
          i += 2 + len
        }
      }
      None
    } else if (p.length >= 13 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a') {
      Some(("image/gif", le16(p, 6), le16(p, 8), 13))
    } else None
  }

  /** Batch feature extraction: header parse + body byte statistics.
    * Unrecognized payloads degrade to application/octet-stream with
    * 0×0 dimensions and whole-payload statistics — ingest never
    * fails on a malformed blob, it reports it.
    */
  private def decodeBatch(batch: Seq[MediaBlob]): Seq[MediaFeatures] =
    batch.map { r =>
      val (mime, w, h, hdr) = parseImageHeader(r.payload)
        .getOrElse(("application/octet-stream", 0, 0, 0))
      val n = r.payload.length
      var sum = 0L
      var i = hdr
      while (i < n) { sum += (r.payload(i) & 0xff); i += 1 }
      val body = n - hdr
      val mean = if (body == 0) 0.0 else sum.toDouble / body
      MediaFeatures(r.doc_id, mime, w, h, n, mean)
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
