package graft

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.operators.Media

/** Pixel-level PNG decode. Two independent correctness anchors:
  * (1) the closed-form synthesis arithmetic (mean = base + chanMean +
  * (h-1)/2, min = base, max = base + chanMax + h-1) and (2) the JDK's
  * OWN PNG codec (javax.imageio), decoding the exact same payload
  * bytes — so graft's encoder and decoder cannot be co-wrong: a
  * shared bug would disagree with ImageIO, and echoed metadata would
  * disagree with the closed form.
  */
class MediaPixelsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0L until n.toLong).map(d => (d, "x" * (10 + d.toInt % 37)))
      .toDF("doc_id", "text")

  test("decodePixels reproduces the closed-form statistics") {
    val out = Media.decodePixels(Media.packMediaPixels(docs(24)))
      .orderBy($"doc_id").collect()
    assert(out.length === 24)
    out.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val len = (10 + d % 37)
      val w = (16 + (d * 7919 + len) % 64).toInt
      val h = (16 + (d * 104729 + len) % 64).toInt
      val base = (d % 64).toInt
      val chanMean = if (d % 2 == 0) 0.0 else 40.0
      val chanMax = if (d % 2 == 0) 0 else 80
      assert(r.getAs[String]("mime") === "image/png")
      assert(r.getAs[Int]("width") === w, s"doc $d width")
      assert(r.getAs[Int]("height") === h, s"doc $d height")
      assert(r.getAs[Int]("n_px") === w * h, s"doc $d n_px")
      assert(r.getAs[Double]("mean_px") === base + chanMean + (h - 1) / 2.0,
        s"doc $d mean")
      assert(r.getAs[Int]("min_px") === base, s"doc $d min")
      assert(r.getAs[Int]("max_px") === base + chanMax + h - 1, s"doc $d max")
    }
  }

  test("graft's decoder agrees sample-for-sample with the JDK PNG codec") {
    val payloads = Media.packMediaPixels(docs(6))
      .orderBy($"doc_id").as[Media.MediaBlob].collect()
    payloads.foreach { blob =>
      val Some((colorType, w, h, samples)) = Media.decodePng(blob.payload)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(blob.payload))
      assert(img != null, s"ImageIO rejected doc ${blob.doc_id}'s PNG")
      assert(img.getWidth === w && img.getHeight === h)
      val bands = if (colorType == 0) 1 else 3
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w; b <- 0 until bands) {
        val mine = samples((y * w + x) * bands + b) & 0xff
        assert(raster.getSample(x, y, b) === mine,
          s"doc ${blob.doc_id} ($x,$y) band $b")
      }
    }
  }

  test("every scanline filter type is present in the encoded stream") {
    // h ≥ 16 > 5, so the y mod 5 cycle guarantees all five filters;
    // verify by decoding the raw filtered bytes
    val blob = Media.packMediaPixels(docs(1)).as[Media.MediaBlob].head()
    // strip to the zlib stream: walk chunks, concatenate IDAT
    val p = blob.payload
    var i = 8
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= p.length) {
      val len = ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      val typ = new String(p, i + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(p, i + 8, len)
      i += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](1 << 20)
    val n = inf.inflate(raw)
    inf.end()
    val Some((_, w, h, _)) = Media.decodePng(p)
    assert(n === h * (1 + w))
    val filters = (0 until h).map(y => raw(y * (1 + w)) & 0xff).toSet
    assert(filters === Set(0, 1, 2, 3, 4))
  }

  test("corrupt payloads degrade to octet-stream, never fail") {
    val good = Media.packMediaPixels(docs(2)).as[Media.MediaBlob].collect()
    val flipped = good.map { b =>
      val p = b.payload.clone()
      p(p.length / 2) = (p(p.length / 2) ^ 0x5a).toByte // breaks a CRC
      Media.MediaBlob(b.doc_id, p)
    }
    val junk = Media.MediaBlob(99L, "not a png at all".getBytes("UTF-8"))
    val out = Media.decodePixels((flipped :+ junk).toSeq.toDS().toDF())
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[String]("mime") === "application/octet-stream")
      assert(r.getAs[Int]("n_px") === 0)
    }
  }
}
