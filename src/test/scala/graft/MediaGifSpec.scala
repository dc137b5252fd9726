package graft

import javax.imageio.ImageIO

import graft.operators.Media

/** GIF LZW decode, refereed BOTH directions against the JDK's own GIF
  * codec so graft's encoder and decoder cannot be co-wrong:
  * (1) graft-encoded payloads decode identically under ImageIO and
  * under graft's decoder (a code-width-timing bug in the encoder
  * breaks ImageIO; one in the decoder breaks the agreement);
  * (2) an ImageIO-ENCODED gif of the same pixels decodes identically
  * under graft's decoder (catches decoder deviations the in-house
  * encoder would mask — ImageIO's writer picks its own sub-block
  * sizes, clear-code schedule and palette layout).
  */
class MediaGifSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0L until n.toLong).map(d => (d, "x" * (10 + d.toInt % 37)))
      .toDF("doc_id", "text")

  test("decodeGifPixels reproduces the closed-form statistics") {
    val out = Media.decodeGifPixels(Media.packMediaGif(docs(24)))
      .orderBy($"doc_id").collect()
    assert(out.length === 24)
    out.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val len = 10 + d % 37
      val w = (16 + (d * 6007 + len) % 48).toInt
      val h = (16 + (d * 9973 + len) % 48).toInt
      val base = (d % 64).toInt
      assert(r.getAs[String]("mime") === "image/gif")
      assert(r.getAs[Int]("width") === w, s"doc $d width")
      assert(r.getAs[Int]("height") === h, s"doc $d height")
      assert(r.getAs[Int]("n_px") === w * h, s"doc $d n_px")
      assert(r.getAs[Double]("mean_px") === base + (w - 1) / 2.0 + (h - 1) / 2.0,
        s"doc $d mean")
      assert(r.getAs[Int]("min_px") === base, s"doc $d min")
      assert(r.getAs[Int]("max_px") === base + w + h - 2, s"doc $d max")
    }
  }

  test("graft-encoded GIFs decode identically under ImageIO and graft's decoder") {
    val payloads = Media.packMediaGif(docs(8))
      .orderBy($"doc_id").as[Media.MediaBlob].collect()
    payloads.foreach { blob =>
      val Some((w, h, samples)) = Media.decodeGif(blob.payload)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(blob.payload))
      assert(img != null, s"ImageIO rejected doc ${blob.doc_id}'s GIF")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgbJdk = img.getRGB(x, y)
        val o = (y * w + x) * 3
        val rgbMine = 0xff000000 | ((samples(o) & 0xff) << 16) |
          ((samples(o + 1) & 0xff) << 8) | (samples(o + 2) & 0xff)
        assert(rgbJdk === rgbMine, s"doc ${blob.doc_id} ($x,$y)")
      }
    }
  }

  test("ImageIO-encoded GIFs decode identically under graft's decoder") {
    // independent encoder: same diagonal-gradient pixels, the JDK's
    // own LZW packer (its own clear schedule and palette layout)
    for (d <- 0L until 6L) {
      val w = 40 + d.toInt * 3
      val h = 35 + d.toInt * 5
      val base = (d % 64).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      // raw raster samples, NOT setRGB — the latter runs an sRGB →
      // linear-gray colorspace conversion that would skew the values
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, base + x + y)
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "gif", bos), "JDK has no GIF writer?")
      val payload = bos.toByteArray
      val Some((dw, dh, samples)) = Media.decodeGif(payload)
      assert(dw === w && dh === h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val expected = base + x + y
        // gray image: all three channels carry the value
        assert((samples(o) & 0xff) === expected, s"doc $d ($x,$y) r")
        assert((samples(o + 1) & 0xff) === expected, s"doc $d ($x,$y) g")
        assert((samples(o + 2) & 0xff) === expected, s"doc $d ($x,$y) b")
      }
    }
  }
}
