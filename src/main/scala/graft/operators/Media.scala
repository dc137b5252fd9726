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
  private def le32hex(x: Column): Column =
    concat(
      lpad(hex(pmod(x, lit(256))), 2, "0"),
      lpad(hex(pmod(floor(x / 256).cast("long"), lit(256))), 2, "0"),
      lpad(hex(pmod(floor(x / 65536).cast("long"), lit(256))), 2, "0"),
      lpad(hex(pmod(floor(x / 16777216).cast("long"), lit(256))), 2, "0"))

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

  // identity transform matrix of an ISO BMFF mvhd/tkhd (36 bytes)
  private val bmffMatrixHex =
    "000100000000000000000000000000000001000000000000000000000000000040000000"

  /** Synthesize an audio/video table from documents: payload = a REAL
    * container header (WAV/RIFF for even doc_ids, ISO BMFF / MP4 for
    * odd — genuine byte layouts: the RIFF chunk walk and the moov box
    * walk both parse with external tools) followed by the UTF-8 text
    * bytes standing in for the sample/mdat stream. Sample-rate,
    * channel count, dimensions, duration and track count are derived
    * deterministically so the oracle recomputes them — the gate then
    * proves [[decodeAvFeatures]] PARSES them back out of the bytes.
    * All native expressions (hex/lpad/unhex/concat): scan speed, no
    * UDF.
    */
  def packMediaAv(docs: DataFrame): DataFrame = {
    val txtLen = length(col("text"))
    val body = octet_length(encode(col("text"), "UTF-8"))
    val sr = (lit(8000) + lit(100) * pmod(col("doc_id") * 7919 + txtLen, lit(441))).cast("int")
    val ch = (lit(1) + pmod(col("doc_id") * 31 + txtLen, lit(2))).cast("int")
    val w = (lit(64) + pmod(col("doc_id") * 7919 + txtLen, lit(512))).cast("int")
    val h = (lit(64) + pmod(col("doc_id") * 104729 + txtLen, lit(512))).cast("int")
    // movie timescale is 1000, so mvhd duration units ARE milliseconds
    val dur = (lit(1000) + pmod(col("doc_id") * 104729 + txtLen, lit(60000))).cast("int")
    val nTrk = (lit(1) + pmod(col("doc_id") * 13 + txtLen, lit(2))).cast("int")

    // WAV: RIFF header, canonical 16-byte PCM fmt chunk, data chunk
    val wavHex = concat(
      lit("52494646"), le32hex(body + 36), lit("57415645"),
      lit("666D7420"), lit("10000000"), lit("0100"),
      le16hex(ch), le32hex(sr), le32hex(sr * ch * 2),
      le16hex(ch * 2), lit("1000"),
      lit("64617461"), le32hex(body))

    // MP4: ftyp, moov(mvhd + 1-2 trak(tkhd)), mdat
    def trakHex(trackId: Int): Column = concat(
      lit("000000647472616B"),   // trak box, size 100
      lit("0000005C746B6864"),   // tkhd box, size 92
      lit("00000007"),           // version 0, flags: enabled|in-movie
      lit("0000000000000000"),   // ctime, mtime
      lit(f"$trackId%08X"),
      lit("00000000"),           // reserved
      be32hex(dur),
      lit("0000000000000000"),   // reserved
      lit("0000000000000000"),   // layer, alt_group, volume, reserved
      lit(bmffMatrixHex),
      be16hex(w), lit("0000"),   // width,  16.16 fixed
      be16hex(h), lit("0000"))   // height, 16.16 fixed
    val mvhdHex = concat(
      lit("0000006C6D766864"),   // mvhd box, size 108
      lit("00000000"),           // version, flags
      lit("0000000000000000"),   // ctime, mtime
      lit("000003E8"),           // timescale 1000
      be32hex(dur),
      lit("00010000"), lit("0100"), lit("0000"), // rate, volume, reserved
      lit("0000000000000000"),   // reserved
      lit(bmffMatrixHex),
      lit("0" * 48),             // pre_defined
      lit("00000003"))           // next_track_id
    val mp4Hex = concat(
      lit("000000106674797069736F6D00000000"),       // ftyp isom
      be32hex(lit(116) + lit(100) * nTrk), lit("6D6F6F76"), // moov
      mvhdHex,
      trakHex(1),
      when(nTrk === 2, trakHex(2)).otherwise(lit("")),
      be32hex(body + 8), lit("6D646174"))            // mdat
    val hdrHex = when(pmod(col("doc_id"), lit(2)) === 0, wavHex).otherwise(mp4Hex)
    docs.select(col("doc_id"),
      concat(unhex(hdrHex), encode(col("text"), "UTF-8")).as("payload"))
  }

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
          // a declared length below 2 (or past the payload) is corrupt
          // for EVERY segment, SOF included — checked before the SOF
          // branch so a bogus SOF length can't yield a wrong header
          // length that silently skews the body statistics
          if (len < 2 || i + 2 + len > p.length) return None
          val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (i + 8 >= p.length) return None
            return Some(("image/jpeg", be16(p, i + 7), be16(p, i + 5), i + 2 + len))
          }
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

  /** Extracted A/V features: container-parsed stream parameters.
    * Audio rows carry sample_rate/channels (0×0 dims); video rows
    * carry width/height/n_tracks (0 Hz). duration_ms comes from the
    * container's own clock (WAV: data bytes / byte-rate; MP4: mvhd
    * duration / timescale).
    */
  final case class MediaAvFeatures(
      doc_id: Long, mime: String, sample_rate: Int, channels: Int,
      width: Int, height: Int, duration_ms: Long, n_tracks: Int,
      n_bytes: Int)

  private def le32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
  private def tag(p: Array[Byte], i: Int): String =
    new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse an audio/video container header from raw bytes:
    * (mime, sampleRate, channels, width, height, durationMs, nTracks).
    * Pure JVM — WAV/RIFF via the chunk walk (canonical PCM fmt chunk +
    * data chunk), MP4/ISO BMFF via the box walk (moov → mvhd timescale/
    * duration, trak → tkhd 16.16 fixed dimensions). None when the
    * bytes are not a recognized container (truncated walks, bogus
    * chunk/box sizes and non-PCM formats all reject rather than
    * guessing).
    */
  private[graft] def parseAvHeader(p: Array[Byte])
      : Option[(String, Int, Int, Int, Int, Long, Int)] = {
    if (p.length >= 44 && tag(p, 0) == "RIFF" && tag(p, 8) == "WAVE") {
      var i = 12
      var sampleRate = 0; var channels = 0; var byteRate = 0L
      var dataLen = -1L
      while (i + 8 <= p.length && (sampleRate == 0 || dataLen < 0)) {
        val id = tag(p, i)
        val sz = le32(p, i + 4)
        if (sz < 0 || i + 8 + sz > p.length) return None
        if (id == "fmt ") {
          if (sz < 16 || le16(p, i + 8) != 1) return None // PCM only
          channels = le16(p, i + 10)
          sampleRate = le32(p, i + 12).toInt
          byteRate = le32(p, i + 16)
          if (channels == 0 || sampleRate == 0 || byteRate == 0) return None
        } else if (id == "data") dataLen = sz
        i += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks are 2-aligned
      }
      if (sampleRate == 0 || dataLen < 0) None
      else Some(("audio/wav", sampleRate, channels, 0, 0,
        dataLen * 1000L / byteRate, 1))
    } else if (p.length >= 16 && tag(p, 4) == "ftyp") {
      var i = 0
      while (i + 8 <= p.length) {
        val sz = be32(p, i)
        if (sz < 8 || i + sz > p.length) return None
        if (tag(p, i + 4) == "moov") {
          var timescale = 0L; var duration = 0L
          var nTracks = 0; var w = 0; var h = 0
          var j = i + 8
          while (j + 8 <= i + sz) {
            val csz = be32(p, j)
            if (csz < 8 || j + csz > i + sz) return None
            tag(p, j + 4) match {
              case "mvhd" =>
                // size check BEFORE the version-byte read: a minimal
                // 8-byte box at the end of the payload would index
                // past it otherwise
                if (csz < 32 || p(j + 8) != 0) return None // v0 layout only
                timescale = be32(p, j + 20) & 0xffffffffL
                duration = be32(p, j + 24) & 0xffffffffL
              case "trak" =>
                nTracks += 1
                var k = j + 8
                while (k + 8 <= j + csz) {
                  val bsz = be32(p, k)
                  if (bsz < 8 || k + bsz > j + csz) return None
                  if (tag(p, k + 4) == "tkhd" && w == 0) {
                    if (bsz < 92 || p(k + 8) != 0) return None
                    w = be32(p, k + 84) >>> 16 // 16.16 fixed
                    h = be32(p, k + 88) >>> 16
                  }
                  k += bsz
                }
              case _ => ()
            }
            j += csz
          }
          if (timescale == 0 || nTracks == 0) return None
          return Some(("video/mp4", 0, 0, w, h,
            duration * 1000L / timescale, nTracks))
        }
        i += sz
      }
      None
    } else None
  }

  /** Batched A/V feature extraction — same degradation contract as
    * [[decodeFeatures]]: unrecognized payloads become
    * application/octet-stream with zeroed stream parameters, never a
    * failed ingest.
    */
  def decodeAvFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob]
      .mapPartitions { rows => rows.grouped(batchSize).flatMap(decodeAvBatch) }
      .toDF()
  }

  /** Batch A/V extraction (same shape as [[decodeBatch]]: the whole
    * batch is handed to the decoder, where a real codec would
    * amortize its setup).
    */
  private def decodeAvBatch(batch: Seq[MediaBlob]): Seq[MediaAvFeatures] =
    batch.map { r =>
      val (mime, sr, ch, w, h, dur, trk) = parseAvHeader(r.payload)
        .getOrElse(("application/octet-stream", 0, 0, 0, 0, 0L, 0))
      MediaAvFeatures(r.doc_id, mime, sr, ch, w, h, dur, trk,
        r.payload.length)
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
