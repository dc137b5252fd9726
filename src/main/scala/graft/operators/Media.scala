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

  // ---------------------------------------------------------------
  // Pixel-level PNG decode — pure JVM (java.util.zip has a full zlib;
  // no codec library needed). The encoder/decoder pair below exercises
  // the whole PNG pipeline: chunk walk with per-chunk CRC32, multi-
  // IDAT concatenation, zlib inflate, and scanline reconstruction for
  // ALL five filter types (None/Sub/Up/Average/Paeth), for 8-bit
  // grayscale (color type 0), RGB (2) and RGBA (6).
  // ---------------------------------------------------------------

  /** Pixel-level features: sample statistics over the DECODED image
    * (every channel sample of every pixel), not the compressed bytes.
    * `n_px` is pixel count (width × height); mean/min/max range over
    * channel samples.
    */
  final case class MediaPixels(
      doc_id: Long, mime: String, width: Int, height: Int,
      n_px: Int, mean_px: Double, min_px: Int, max_px: Int)

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    val len = data.length
    out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte), 0, 4)
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    out.write(t, 0, 4)
    out.write(data, 0, len)
    val c = crc.getValue
    out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
      (c >>> 8).toByte, c.toByte), 0, 4)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit image (rows of channel samples, `bpp` bytes per
    * pixel) as a COMPLETE valid PNG: signature, IHDR, zlib-deflated
    * filtered scanlines split across two IDAT chunks (decoders must
    * concatenate — PNG spec §5.6), IEND. The filter type cycles
    * y mod 5 so every reconstruction path is exercised on every image.
    */
  private[graft] def encodePng(w: Int, h: Int, colorType: Int,
                               sample: (Int, Int, Int) => Int): Array[Byte] = {
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val cur = new Array[Byte](stride)
    val prior = new Array[Byte](stride)
    var y = 0
    var o = 0
    while (y < h) {
      var i = 0
      while (i < stride) {
        cur(i) = sample(i / bpp, y, i % bpp).toByte
        i += 1
      }
      val ft = y % 5
      raw(o) = ft.toByte; o += 1
      i = 0
      while (i < stride) {
        val x = cur(i) & 0xff
        val left = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val up = if (y > 0) prior(i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) prior(i - bpp) & 0xff else 0
        raw(o) = (ft match {
          case 0 => x
          case 1 => x - left
          case 2 => x - up
          case 3 => x - (left + up) / 2
          case 4 => x - paeth(left, up, ul)
        }).toByte
        o += 1; i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) zBuf.write(tmp, 0, d.deflate(tmp))
    d.end()
    val z = zBuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngSig, 0, 8)
    val ihdr = Array[Byte]((w >>> 24).toByte, (w >>> 16).toByte,
      (w >>> 8).toByte, w.toByte, (h >>> 24).toByte, (h >>> 16).toByte,
      (h >>> 8).toByte, h.toByte, 8, colorType.toByte, 0, 0, 0)
    chunk(out, "IHDR", ihdr)
    val cut = z.length / 2
    chunk(out, "IDAT", z.take(cut))
    chunk(out, "IDAT", z.drop(cut))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Synthesize fully-decodable PNGs from documents: even doc_ids are
    * 8-bit grayscale, odd are RGB (channel offsets 0/40/80). Pixel
    * value is constant per scanline — `(doc_id mod 64) + y` plus the
    * channel offset, all < 256 by construction — so the external
    * oracle recomputes mean/min/max in closed form
    * (`mean = base + chanMean + (h-1)/2`) while the engine must
    * actually inflate and unfilter the bytes to reproduce it. Unlike
    * the header-only packers this one runs a real zlib encode per row,
    * so it is a typed map, not a column expression — generation is
    * test scaffolding; the DECODE path is the product.
    */
  def packMediaPixels(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (d, text) =>
        val len = text.codePointCount(0, text.length).toLong
        val w = (16 + ((d * 7919 + len) % 64)).toInt
        val h = (16 + ((d * 104729 + len) % 64)).toInt
        val base = (d % 64).toInt
        val payload =
          if (d % 2 == 0) encodePng(w, h, 0, (_, y, _) => base + y)
          else encodePng(w, h, 2, (_, y, ch) => base + y + 40 * ch)
        MediaBlob(d, payload)
      }
      .toDF()
  }

  /** Full PNG decode: signature + chunk walk (verifying every chunk
    * CRC), concatenated-IDAT zlib inflate, scanline reconstruction for
    * filter types 0-4 at any bpp. Returns (colorType, width, height,
    * channel samples) or None for anything that is not an
    * 8-bit non-interlaced gray/RGB/RGBA PNG — truncated streams, CRC
    * mismatches and short pixel data all reject rather than guessing.
    */
  private[graft] def decodePng(p: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    if (p.length < 45 || !p.take(8).sameElements(pngSig)) return None
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var end = false
    while (!end) {
      if (i + 8 > p.length) return None
      val len = be32(p, i)
      if (len < 0 || i + 12 + len > p.length) return None
      val typ = tag(p, i + 4)
      val crc = new java.util.zip.CRC32
      crc.update(p, i + 4, 4 + len)
      if (crc.getValue != (be32(p, i + 8 + len) & 0xffffffffL)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(p, i + 8); h = be32(p, i + 12)
          colorType = p(i + 17) & 0xff
          // 8-bit depth, compression 0, filter 0, non-interlaced only
          if (p(i + 16) != 8 || p(i + 18) != 0 || p(i + 19) != 0 ||
            p(i + 20) != 0) return None
          if (colorType != 0 && colorType != 2 && colorType != 6) return None
          if (w <= 0 || h <= 0) return None
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => end = true
        case _ => () // ancillary chunks are legal; skip
      }
      i += 12 + len
    }
    if (colorType < 0) return None
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // reconstruct in place into a packed sample array
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      val ro = y * (1 + stride) + 1
      val oo = y * stride
      var x = 0
      while (x < stride) {
        val f = raw(ro + x) & 0xff
        val left = if (x >= bpp) out(oo + x - bpp) & 0xff else 0
        val up = if (y > 0) out(oo - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) out(oo - stride + x - bpp) & 0xff else 0
        out(oo + x) = (ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
        }).toByte
        x += 1
      }
      y += 1
    }
    Some((colorType, w, h, out))
  }

  /** Batched pixel-level decode: each payload is fully decoded (zlib
    * inflate + unfilter) and reduced to sample statistics in the scan
    * stage — payload bytes never shuffle, only the 8-column feature
    * rows move. Non-PNG payloads degrade to application/octet-stream
    * with zeroed stats (same never-fail ingest contract as
    * [[decodeFeatures]]).
    */
  def decodePixels(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            decodePng(r.payload) match {
              case Some((_, w, h, samples)) =>
                var sum = 0L; var mn = 255; var mx = 0
                var i = 0
                while (i < samples.length) {
                  val v = samples(i) & 0xff
                  sum += v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i += 1
                }
                MediaPixels(r.doc_id, "image/png", w, h, w * h,
                  sum.toDouble / samples.length, mn, mx)
              case None =>
                MediaPixels(r.doc_id, "application/octet-stream", 0, 0,
                  0, 0.0, 0, 0)
            }
          }
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------
  // GIF pixel decode — the LZW sibling of the PNG path, closing the
  // palette-format decode gap: real GIF89a streams (variable-width
  // LSB-first LZW codes, clear-code resets, extension blocks, global
  // color table) decoded back to RGB samples, pure JVM.
  // ---------------------------------------------------------------

  /** Encode an 8-bit-palette image as a COMPLETE valid GIF89a:
    * logical screen descriptor, 256-entry grayscale global color
    * table (index i → (i,i,i)), a comment extension (so decoders must
    * walk extension blocks), image descriptor, REAL variable-width
    * LZW image data in ≤255-byte sub-blocks, trailer. The LZW
    * dictionary is capped at 3000 entries with an explicit clear-code
    * reset, so every stream long enough exercises code-width growth
    * (9→12 bits) AND the reset path while staying clear of the
    * 12-bit-full boundary. Encoder/decoder code-width timing is the
    * mirrored pair (enc bumps at next == 2^w + 1, dec at next == 2^w);
    * MediaGifSpec referees both directions against the JDK's own GIF
    * codec so they cannot be co-wrong.
    */
  private[graft] def encodeGif(w: Int, h: Int,
                               sample: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16w(w); le16w(h)
    out.write(0xF7); out.write(0); out.write(0) // GCT, 256 entries
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    out.write(0x21); out.write(0xFE) // comment extension
    out.write(5); out.write("graft".getBytes("US-ASCII")); out.write(0)
    out.write(0x2C); le16w(0); le16w(0); le16w(w); le16w(h); out.write(0)
    val minCode = 8
    val Clear = 1 << minCode
    val Eoi = Clear + 1
    out.write(minCode)
    val data = new java.io.ByteArrayOutputStream()
    var bits = 0L
    var nbits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      bits |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { data.write((bits & 0xff).toInt); bits >>>= 8; nbits -= 8 }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = Eoi + 1
    put(Clear)
    var prefix = -1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = sample(x, y) & 0xff
        if (prefix < 0) prefix = px
        else {
          val hit = dict.get(prefix * 256 + px)
          if (hit != null) prefix = hit
          else {
            put(prefix)
            if (next >= 3000) {
              put(Clear); dict.clear(); next = Eoi + 1; width = minCode + 1
            } else {
              dict.put(prefix * 256 + px, next)
              next += 1
              if (next == (1 << width) + 1 && width < 12) width += 1
            }
            prefix = px
          }
        }
        x += 1
      }
      y += 1
    }
    if (prefix >= 0) put(prefix)
    put(Eoi)
    if (nbits > 0) data.write((bits & 0xff).toInt)
    val z = data.toByteArray
    var o = 0
    while (o < z.length) {
      val n = math.min(255, z.length - o)
      out.write(n); out.write(z, o, n)
      o += n
    }
    out.write(0); out.write(0x3B)
    out.toByteArray
  }

  /** Synthesize fully-decodable GIFs from documents: pixel index at
    * (x, y) is `(doc_id mod 64) + x + y` — always < 256 by
    * construction (w, h ≤ 63), so the external oracle recomputes
    * mean/min/max in closed form (mean = base + (w−1)/2 + (h−1)/2)
    * while the engine must actually unpack the variable-width LZW
    * codes to reproduce it. The diagonal gradient compresses
    * non-trivially (runs along anti-diagonals), growing the
    * dictionary through several code widths on every image.
    */
  def packMediaGif(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (d, text) =>
        val len = text.codePointCount(0, text.length).toLong
        val w = (16 + ((d * 6007 + len) % 48)).toInt
        val h = (16 + ((d * 9973 + len) % 48)).toInt
        val base = (d % 64).toInt
        MediaBlob(d, encodeGif(w, h, (x, y) => base + x + y))
      }
      .toDF()
  }

  /** Full GIF decode: signature + logical screen descriptor + global
    * color table, extension-block walk, image descriptor (local
    * palette honored when present), variable-width LSB-first LZW with
    * clear-code resets and the KwKwK case, 4-pass interlace row
    * mapping, palette lookup to packed RGB samples. Returns (width,
    * height, rgb samples of length w·h·3) or None for anything not a
    * full-screen single-image GIF — truncated streams, out-of-range
    * codes and short pixel data all reject rather than guessing.
    */
  private[graft] def decodeGif(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p.length < 14) return None
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(p, 6)
    val h = le16(p, 8)
    if (w <= 0 || h <= 0) return None
    val packed = p(10) & 0xff
    var i = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      if (i + 3 * n > p.length) return None
      gct = java.util.Arrays.copyOfRange(p, i, i + 3 * n)
      i += 3 * n
    }
    while (i < p.length) {
      (p(i) & 0xff) match {
        case 0x21 => // extension: introducer, label, sub-blocks, 0
          i += 2
          while (i < p.length && p(i) != 0) i += 1 + (p(i) & 0xff)
          if (i >= p.length) return None
          i += 1
        case 0x2C =>
          if (i + 10 > p.length) return None
          val left = le16(p, i + 1); val top = le16(p, i + 3)
          val iw = le16(p, i + 5); val ih = le16(p, i + 7)
          val ip = p(i + 9) & 0xff
          val interlaced = (ip & 0x40) != 0
          if (left != 0 || top != 0 || iw != w || ih != h) return None
          i += 10
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 7) + 1)
            if (i + 3 * n > p.length) return None
            pal = java.util.Arrays.copyOfRange(p, i, i + 3 * n)
            i += 3 * n
          }
          if (pal == null || i >= p.length) return None
          val minCode = p(i) & 0xff
          if (minCode < 2 || minCode > 8) return None
          i += 1
          // gather the LZW sub-blocks
          val z = new java.io.ByteArrayOutputStream()
          while (i < p.length && p(i) != 0) {
            val n = p(i) & 0xff
            if (i + 1 + n > p.length) return None
            z.write(p, i + 1, n)
            i += 1 + n
          }
          if (i >= p.length) return None
          val idx = lzwDecode(z.toByteArray, minCode, w * h)
            .getOrElse(return None)
          // interlaced streams carry rows in 4-pass order (8k, 8k+4,
          // 4k+2, 2k+1 — GIF89a spec appendix E); map the j-th decoded
          // row back to its screen row
          val rowOf: Int => Int =
            if (!interlaced) identity
            else {
              val order = new Array[Int](h)
              var k = 0
              Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (s, step) =>
                var r = s
                while (r < h) { order(k) = r; k += 1; r += step }
              }
              order(_)
            }
          val out = new Array[Byte](w * h * 3)
          var j = 0
          while (j < idx.length) {
            val pi = (idx(j) & 0xff) * 3
            if (pi + 2 >= pal.length) return None
            val o = (rowOf(j / w) * w + j % w) * 3
            out(o) = pal(pi)
            out(o + 1) = pal(pi + 1)
            out(o + 2) = pal(pi + 2)
            j += 1
          }
          return Some((w, h, out))
        case 0x3B => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** Variable-width LSB-first GIF LZW: returns exactly `nPixels`
    * palette indices or None (bad code, truncated stream, output
    * over/underflow). Handles clear-code resets mid-stream, the
    * KwKwK (code == next slot) case, and a full table (stops adding,
    * keeps reading — the deferred-clear behavior real encoders rely
    * on).
    */
  private def lzwDecode(z: Array[Byte], minCode: Int,
                        nPixels: Int): Option[Array[Byte]] = {
    val Clear = 1 << minCode
    val Eoi = Clear + 1
    val prefixA = new Array[Int](4096)
    val suffixA = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    val out = new Array[Byte](nPixels)
    var got = 0
    var width = minCode + 1
    var next = Eoi + 1
    var prev = -1
    var bits = 0L
    var nbits = 0
    var zi = 0
    def firstSym(code0: Int): Byte = {
      var cd = code0
      while (cd >= Clear + 2) cd = prefixA(cd)
      cd.toByte
    }
    def emit(code0: Int): Boolean = { // expand code to out; false on overflow
      var cd = code0
      var sp = 0
      while (cd >= Clear + 2) { stack(sp) = suffixA(cd); sp += 1; cd = prefixA(cd) }
      if (got + sp + 1 > nPixels) return false
      out(got) = cd.toByte; got += 1
      while (sp > 0) { sp -= 1; out(got) = stack(sp); got += 1 }
      true
    }
    while (true) {
      while (nbits < width) {
        if (zi >= z.length) return None // truncated before EOI
        bits |= (z(zi) & 0xffL) << nbits
        nbits += 8
        zi += 1
      }
      val code = (bits & ((1L << width) - 1)).toInt
      bits >>>= width
      nbits -= width
      if (code == Clear) {
        next = Eoi + 1; width = minCode + 1; prev = -1
      } else if (code == Eoi) {
        return if (got == nPixels) Some(out) else None
      } else if (prev < 0) {
        if (code >= Clear) return None
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > next || code == Clear + 1) return None
        val k = if (code == next) firstSym(prev) else firstSym(code)
        if (code == next) { // KwKwK: string(prev) + first(prev)
          var cd = prev
          var sp = 0
          while (cd >= Clear + 2) { stack(sp) = suffixA(cd); sp += 1; cd = prefixA(cd) }
          if (got + sp + 2 > nPixels) return None
          out(got) = cd.toByte; got += 1
          while (sp > 0) { sp -= 1; out(got) = stack(sp); got += 1 }
          out(got) = k; got += 1
        } else if (!emit(code)) return None
        if (next < 4096) {
          prefixA(next) = prev
          suffixA(next) = k
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    None // unreachable
  }

  /** Batched GIF pixel decode: LZW-unpack + palette-resolve in the
    * scan stage, reduced to RGB sample statistics — payload bytes
    * never shuffle. Non-GIF payloads degrade to
    * application/octet-stream with zeroed stats (the never-fail
    * ingest contract of [[decodeFeatures]]).
    */
  def decodeGifPixels(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            decodeGif(r.payload) match {
              case Some((w, h, samples)) =>
                var sum = 0L; var mn = 255; var mx = 0
                var i = 0
                while (i < samples.length) {
                  val v = samples(i) & 0xff
                  sum += v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i += 1
                }
                MediaPixels(r.doc_id, "image/gif", w, h, w * h,
                  sum.toDouble / samples.length, mn, mx)
              case None =>
                MediaPixels(r.doc_id, "application/octet-stream", 0, 0,
                  0, 0.0, 0, 0)
            }
          }
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------
  // Sample-level PCM audio decode — the WAV analog of the pixel path:
  // real 16-bit little-endian signed PCM in a canonical RIFF layout,
  // decoded back to waveform statistics (DC offset, RMS, peak).
  // ---------------------------------------------------------------

  /** Sample-level audio features over the DECODED waveform: total
    * sample count (all channels), DC offset (mean), RMS and peak
    * absolute amplitude in raw 16-bit units.
    */
  final case class MediaPcm(
      doc_id: Long, mime: String, sample_rate: Int, channels: Int,
      n_samples: Int, mean_amp: Double, rms_amp: Double, peak_amp: Int)

  /** Synthesize complete PCM WAVs from documents: canonical 44-byte
    * RIFF header (16-byte PCM fmt chunk) followed by real 16-bit LE
    * samples `a · ((i mod 200) − 100)` with per-doc amplitude
    * `a = 1 + doc_id mod 5`. Sample sums are exact integers with
    * closed forms (full 200-cycles plus a partial ramp), so the
    * oracle recomputes mean/RMS/peak arithmetically while the engine
    * must actually parse the chunk walk and decode the little-endian
    * samples. Typed map like [[packMediaPixels]] — generation is
    * scaffolding, the decode is the product.
    */
  def packMediaPcm(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (d, text) =>
        val len = text.codePointCount(0, text.length).toLong
        val n = (256 + 2 * ((d * 7919 + len) % 512)).toInt // even: fills frames
        val a = (1 + d % 5).toInt
        val sr = (8000 + 100 * ((d * 7919 + len) % 441)).toInt
        val ch = (1 + (d * 31 + len) % 2).toInt
        val dataLen = 2 * n
        val out = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(ch.toShort).putInt(sr)
          .putInt(sr * ch * 2).putShort((ch * 2).toShort).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < n) {
          out.putShort((a * ((i % 200) - 100)).toShort)
          i += 1
        }
        MediaBlob(d, out.array())
      }
      .toDF()
  }

  /** Batched sample-level PCM decode: RIFF chunk walk to the fmt and
    * data chunks (16-bit PCM only), little-endian signed sample
    * decode, waveform statistics in the scan stage. Non-WAV payloads
    * degrade to application/octet-stream with zeroed stats — the same
    * never-fail ingest contract as the other decoders.
    */
  def decodePcmFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaBlob]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r => decodePcm(r.doc_id, r.payload) }
        }
      }
      .toDF()
  }

  private def decodePcm(docId: Long, p: Array[Byte]): MediaPcm = {
    val none = MediaPcm(docId, "application/octet-stream", 0, 0, 0, 0.0, 0.0, 0)
    if (p.length < 44 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE") return none
    var i = 12
    var sr = 0; var ch = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= p.length && (sr == 0 || dataOff < 0)) {
      val id = tag(p, i)
      val sz = le32(p, i + 4)
      if (sz < 0 || i + 8 + sz > p.length) return none
      if (id == "fmt ") {
        if (sz < 16 || le16(p, i + 8) != 1) return none // PCM only
        ch = le16(p, i + 10)
        sr = le32(p, i + 12).toInt
        bits = le16(p, i + 22)
        if (ch == 0 || sr == 0 || bits != 16) return none
      } else if (id == "data") { dataOff = i + 8; dataLen = sz.toInt }
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (sr == 0 || dataOff < 0 || dataLen % 2 != 0) return none
    val n = dataLen / 2
    if (n == 0) return MediaPcm(docId, "audio/wav", sr, ch, 0, 0.0, 0.0, 0)
    var sum = 0L; var ss = 0L; var peak = 0
    var j = 0
    while (j < n) {
      // little-endian signed 16-bit
      val v = (le16(p, dataOff + 2 * j) << 16) >> 16
      sum += v; ss += v.toLong * v
      val av = math.abs(v)
      if (av > peak) peak = av
      j += 1
    }
    MediaPcm(docId, "audio/wav", sr, ch, n,
      sum.toDouble / n, math.sqrt(ss.toDouble / n), peak)
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
