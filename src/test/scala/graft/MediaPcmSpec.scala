package graft

import javax.sound.sampled.AudioSystem

import graft.operators.Media

/** Sample-level PCM decode. Same two-anchor structure as
  * MediaPixelsSpec: (1) the closed-form synthesis arithmetic and
  * (2) the JDK's OWN WAV codec (javax.sound.sampled) decoding the
  * exact same payload bytes — a shared encoder/decoder bug would
  * disagree with AudioSystem; echoed metadata would disagree with the
  * closed form.
  */
class MediaPcmSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0L until n.toLong).map(d => (d, "x" * (10 + d.toInt % 37)))
      .toDF("doc_id", "text")

  test("decodePcmFeatures reproduces the closed-form waveform statistics") {
    val out = Media.decodePcmFeatures(Media.packMediaPcm(docs(20)))
      .orderBy($"doc_id").collect()
    assert(out.length === 20)
    out.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val len = 10 + d % 37
      val n = (256 + 2 * ((d * 7919 + len) % 512)).toInt
      val a = (1 + d % 5).toInt
      val f = n / 200; val k = n % 200
      val sum = a.toLong * (f * -100L + (k.toLong * (k - 1) / 2 - 100L * k))
      val ss = a.toLong * a * (f * 666700L +
        ((k - 1).toLong * k * (2 * k - 1) / 6 - 100L * k * (k - 1) + 10000L * k))
      assert(r.getAs[String]("mime") === "audio/wav")
      assert(r.getAs[Int]("sample_rate") === (8000 + 100 * ((d * 7919 + len) % 441)).toInt)
      assert(r.getAs[Int]("channels") === (1 + (d * 31 + len) % 2).toInt)
      assert(r.getAs[Int]("n_samples") === n, s"doc $d n")
      assert(r.getAs[Double]("mean_amp") === sum.toDouble / n, s"doc $d mean")
      assert(r.getAs[Double]("rms_amp") === math.sqrt(ss.toDouble / n), s"doc $d rms")
      assert(r.getAs[Int]("peak_amp") === 100 * a, s"doc $d peak")
    }
  }

  test("graft's PCM decode agrees sample-for-sample with the JDK WAV codec") {
    val payloads = Media.packMediaPcm(docs(6))
      .orderBy($"doc_id").as[Media.MediaBlob].collect()
    payloads.foreach { blob =>
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob.payload))
      val fmt = in.getFormat
      assert(fmt.getSampleSizeInBits === 16 && !fmt.isBigEndian)
      val bytes = in.readAllBytes()
      val jdk = (0 until bytes.length / 2).map(j =>
        (((bytes(2 * j + 1) & 0xff) << 8) | (bytes(2 * j) & 0xff)).toShort.toInt)
      val d = blob.doc_id
      val a = (1 + d % 5).toInt
      jdk.zipWithIndex.foreach { case (v, i) =>
        assert(v === a * ((i % 200) - 100), s"doc $d sample $i")
      }
      // and the engine's statistics over those same samples
      val row = Media.decodePcmFeatures(Seq(blob).toDS().toDF()).head()
      assert(row.getAs[Int]("n_samples") === jdk.length)
      assert(row.getAs[Int]("peak_amp") === jdk.map(math.abs).max)
    }
  }

  test("corrupt payloads degrade to octet-stream, never fail") {
    val truncated = Media.packMediaPcm(docs(1)).as[Media.MediaBlob].head()
    val cases = Seq(
      Media.MediaBlob(1L, "definitely not audio".getBytes("UTF-8")),
      Media.MediaBlob(2L, truncated.payload.take(50)), // data chunk overruns
      Media.MediaBlob(3L, Array[Byte]()))
    val out = Media.decodePcmFeatures(cases.toDS().toDF()).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[String]("mime") === "application/octet-stream")
      assert(r.getAs[Int]("n_samples") === 0)
    }
  }
}
