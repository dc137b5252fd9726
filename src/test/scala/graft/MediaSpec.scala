package graft

import graft.operators.Media

/** parseImageHeader against hand-laid-out header bytes matching the
  * real file formats — including segments the parser must skip (JFIF
  * APP0) and corrupt inputs it must reject.
  */
class MediaSpec extends SparkSpec {

  private def bytes(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG: signature + IHDR parses width/height (1×1 real-file header)") {
    // the exact leading 33 bytes of a canonical 1×1 RGBA PNG
    val p = bytes(
      "89504E470D0A1A0A 0000000D 49484452 00000001 00000001 08 06 000000 1F15C489")
    assert(Media.parseImageHeader(p) === Some(("image/png", 1, 1, 33)))
  }

  test("PNG: large dimensions decode big-endian") {
    val p = bytes(
      "89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08 02 000000 00000000")
    assert(Media.parseImageHeader(p) === Some(("image/png", 640, 480, 33)))
  }

  test("JPEG: marker scan skips APP0 (JFIF) and reads SOF0 height/width") {
    val p = bytes(
      "FFD8" + // SOI
        "FFE0 0010 4A46494600 0101 00 0001 0001 0000" + // APP0 JFIF, len 16
        "FFC0 0011 08 0100 0200 03 012200 021101 031101") // SOF0: h=256 w=512
    assert(Media.parseImageHeader(p) === Some(("image/jpeg", 512, 256, 39)))
  }

  test("JPEG: progressive SOF2 is a frame header too; DHT is not") {
    val p = bytes(
      "FFD8" +
        "FFC4 0005 00 11 22" + // DHT (must be skipped, not treated as SOF)
        "FFC2 0011 08 0040 0030 03 012200 021101 031101") // SOF2: h=64 w=48
    assert(Media.parseImageHeader(p) === Some(("image/jpeg", 48, 64, 28)))
  }

  test("GIF: little-endian logical screen descriptor") {
    val p = bytes("474946383961 0A00 1400 F7 00 00") // GIF89a 10×20
    assert(Media.parseImageHeader(p) === Some(("image/gif", 10, 20, 13)))
    val p87 = bytes("474946383761 FF01 0002 00 00 00") // GIF87a 511×512
    assert(Media.parseImageHeader(p87) === Some(("image/gif", 511, 512, 13)))
  }

  test("corrupt or foreign bytes are rejected") {
    assert(Media.parseImageHeader("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(Media.parseImageHeader(Array.emptyByteArray).isEmpty)
    // JPEG SOI but garbage where a marker should be
    assert(Media.parseImageHeader(bytes("FFD8 12345678")).isEmpty)
    // PNG signature but first chunk is not IHDR
    assert(Media.parseImageHeader(bytes(
      "89504E470D0A1A0A 0000000D 49444154 00000001 00000001 08 06 000000 00000000"))
      .isEmpty)
  }

  test("JPEG: a SOF segment with a bogus declared length is corrupt, not parsed") {
    // len=0 on the SOF segment: the old code took the SOF branch before
    // the len<2 check and returned header length i+2+0, silently
    // folding header bytes into the body statistics
    assert(Media.parseImageHeader(bytes(
      "FFD8 FFC0 0000 08 0100 0200 03 012200 021101 031101")).isEmpty)
    // a non-SOF segment whose declared length runs past the payload
    assert(Media.parseImageHeader(bytes("FFD8 FFE0 7FFF 00")).isEmpty)
  }

  test("WAV: RIFF chunk walk parses PCM fmt and data duration") {
    // 44.1 kHz stereo 16-bit, 882 000 data bytes → 5000 ms
    val p = bytes(
      "52494646 24750D00 57415645" +
        "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
        "64617461 D0750D00") ++ Array.fill(0xD75D0)(0x7f.toByte)
    assert(Media.parseAvHeader(p) ===
      Some(("audio/wav", 44100, 2, 0, 0, 5000L, 1)))
  }

  test("WAV: an extra chunk before fmt is skipped; non-PCM rejects") {
    // LIST chunk (4 bytes) precedes fmt; mono 8 kHz, 16 000 data
    // bytes → 1000 ms
    val p = bytes(
      "52494646 38000000 57415645" +
        "4C495354 04000000 494E464F" +
        "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
        "64617461 803E0000") ++ Array.fill(16000)(0.toByte)
    assert(Media.parseAvHeader(p) === Some(("audio/wav", 8000, 1, 0, 0, 1000L, 1)))
    // audioFormat 3 (IEEE float) is not the canonical PCM layout
    val f = bytes(
      "52494646 24000000 57415645" +
        "666D7420 10000000 0300 0100 401F0000 803E0000 0200 1000" +
        "64617461 00000000")
    assert(Media.parseAvHeader(f).isEmpty)
  }

  test("MP4: box walk parses mvhd timescale/duration and tkhd dims") {
    import org.apache.spark.sql.functions._
    // use the synthesis itself for a full byte layout, then parse it
    import spark.implicits._
    val docs = Seq((1L, "hello mp4 world"), (2L, "wav doc")).toDF("doc_id", "text")
    val feats = Media.decodeAvFeatures(Media.packMediaAv(docs))
      .orderBy(col("doc_id")).collect()
    val Array(mp4, wav) = feats
    assert(mp4.getAs[String]("mime") === "video/mp4")
    val txtLen = "hello mp4 world".length
    assert(mp4.getAs[Int]("width") === 64 + (1 * 7919 + txtLen) % 512)
    assert(mp4.getAs[Int]("height") === 64 + (1 * 104729 + txtLen) % 512)
    assert(mp4.getAs[Long]("duration_ms") === 1000L + (1 * 104729 + txtLen) % 60000)
    assert(mp4.getAs[Int]("n_tracks") === 1 + (1 * 13 + txtLen) % 2)
    assert(mp4.getAs[Int]("sample_rate") === 0)
    val wLen = "wav doc".length
    assert(wav.getAs[String]("mime") === "audio/wav")
    val sr = 8000 + 100 * ((2 * 7919 + wLen) % 441)
    val ch = 1 + (2 * 31 + wLen) % 2
    assert(wav.getAs[Int]("sample_rate") === sr)
    assert(wav.getAs[Int]("channels") === ch)
    assert(wav.getAs[Long]("duration_ms") === wLen * 1000L / (sr * ch * 2))
    assert(wav.getAs[Int]("n_bytes") === 44 + wLen)
  }

  test("corrupt A/V bytes are rejected") {
    assert(Media.parseAvHeader("not a container".getBytes("UTF-8")).isEmpty)
    // RIFF/WAVE but truncated before any chunk completes
    assert(Media.parseAvHeader(bytes(
      "52494646 FFFFFF7F 57415645 666D7420 10000000 0100")).isEmpty)
    // ftyp but a box size that runs past the payload
    assert(Media.parseAvHeader(bytes(
      "00000010 66747970 69736F6D 00000000 7FFFFFFF 6D6F6F76")).isEmpty)
    // minimal 8-byte mvhd/tkhd as the LAST bytes of the payload: the
    // version-byte read must not index past the array (regression:
    // the size check ran second and this threw instead of rejecting)
    assert(Media.parseAvHeader(bytes(
      "00000010 66747970 69736F6D 00000000 00000010 6D6F6F76 00000008 6D766864"))
      .isEmpty)
    assert(Media.parseAvHeader(bytes(
      "00000010 66747970 69736F6D 00000000 00000018 6D6F6F76" +
        "00000010 7472616B 00000008 746B6864")).isEmpty)
  }
}
