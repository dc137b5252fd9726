package graft.sources

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}
import org.apache.spark.sql.SparkSession

/** Hadoop CompressionCodec bridging Spark's text formats (jsonl, csv,
  * text) to the zstd-jni library that is ALREADY on Spark's classpath
  * (Spark bundles it for shuffle/event-log compression) — real corpus
  * drops arrive as `.jsonl.zst`, and Hadoop's own ZStandardCodec
  * needs a native libhadoop build this (and many a stock) deployment
  * does not ship: `write.option("compression", "zstd")` fails with
  * CODEC_NOT_AVAILABLE here. Spark accepts a fully-qualified codec
  * class name in the same option, and reads discover codecs by file
  * extension through `io.compression.codecs` ([[ZstdJniCodec.register]]).
  *
  * Like gzip (and unlike block-seekable formats), a zstd-compressed
  * text file is NOT splittable — one file = one read task. Corpus
  * drops should arrive as many files; the ingest parallelism is the
  * file count, which is how `.jsonl.zst` drops are shipped in
  * practice anyway.
  *
  * The pooled Compressor/Decompressor objects are bookkeeping only:
  * Hadoop's line readers obtain one from CodecPool and pass it to
  * `createInputStream(in, decompressor)`, which this codec ignores —
  * the returned streams wrap zstd-jni's own streaming API. Their
  * data methods throw rather than silently pass bytes through, so a
  * code path that DID try to use them surfaces immediately.
  */
final class ZstdJniCodec extends Configurable with CompressionCodec {
  private var conf: Configuration = _
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf
  override def getDefaultExtension: String = ".zst"
  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdJniCodec.ZstdJniOutputStream(out)
  override def createOutputStream(out: OutputStream,
                                  c: Compressor): CompressionOutputStream =
    createOutputStream(out)
  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdJniCodec.ZstdJniInputStream(in)
  override def createInputStream(in: InputStream,
                                 d: Decompressor): CompressionInputStream =
    createInputStream(in)
  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZstdJniCodec.PooledOnlyCompressor]
  override def createCompressor(): Compressor =
    new ZstdJniCodec.PooledOnlyCompressor
  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZstdJniCodec.PooledOnlyDecompressor]
  override def createDecompressor(): Decompressor =
    new ZstdJniCodec.PooledOnlyDecompressor
}

object ZstdJniCodec {

  /** Register for extension-based READ discovery: Hadoop's
    * CompressionCodecFactory resolves a file's codec from
    * `io.compression.codecs`, so without this a `.zst` input is read
    * as raw bytes. Idempotent; writes need no registration (the
    * write option carries the class name).
    */
  def register(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val name = classOf[ZstdJniCodec].getName
    val cur = conf.get(key, "")
    if (!cur.split(",").map(_.trim).contains(name))
      conf.set(key, if (cur.isEmpty) name else s"$cur,$name")
  }

  private final class ZstdJniOutputStream(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    private val z = new com.github.luben.zstd.ZstdOutputStream(raw)
    override def write(b: Int): Unit = z.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      z.write(b, off, len)
    override def finish(): Unit = z.flush()
    override def flush(): Unit = z.flush()
    override def resetState(): Unit = ()
    override def close(): Unit = z.close() // writes the frame epilogue
  }

  private final class ZstdJniInputStream(raw: InputStream)
      extends CompressionInputStream(raw) {
    private val z = new com.github.luben.zstd.ZstdInputStream(raw)
    override def read(): Int = z.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      z.read(b, off, len)
    override def resetState(): Unit = ()
    override def close(): Unit = z.close()
  }

  private def neverCalled(): Nothing = throw new UnsupportedOperationException(
    "ZstdJniCodec (de)compresses via its streams; the pooled object is bookkeeping only")

  final class PooledOnlyCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = neverCalled()
    override def needsInput(): Boolean = neverCalled()
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = neverCalled()
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = neverCalled()
    override def finished(): Boolean = neverCalled()
    override def compress(b: Array[Byte], off: Int, len: Int): Int = neverCalled()
    override def reset(): Unit = () // CodecPool return path
    override def end(): Unit = ()
    override def reinit(conf: Configuration): Unit = ()
  }

  final class PooledOnlyDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = neverCalled()
    override def needsInput(): Boolean = neverCalled()
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = neverCalled()
    override def needsDictionary(): Boolean = neverCalled()
    override def finished(): Boolean = neverCalled()
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = neverCalled()
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }
}
