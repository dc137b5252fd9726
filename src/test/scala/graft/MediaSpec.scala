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
}
