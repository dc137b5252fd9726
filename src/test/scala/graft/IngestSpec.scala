package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.{Ingest, ZstdJniCodec}

/** Third-party-format ingest: the PERMISSIVE quarantine contract on
  * real file drops, and the ZstdJniCodec bridge that gives Spark's
  * text formats zstd on deployments without native Hadoop zstd.
  */
class IngestSpec extends SparkSpec {

  test("zstd jsonl roundtrip: .zst files written, read back value-exact") {
    import spark.implicits._
    ZstdJniCodec.register(spark)
    val dir = Files.createTempDirectory("ingest-zstd").toString
    val rows = (1L to 5000L).map(i => s"""{"doc_id":$i,"text":"doc number $i"}""")
    rows.toDF("value").repartition(3)
      .write.option("compression", classOf[ZstdJniCodec].getName)
      .text(s"$dir/drop")
    val files = new java.io.File(s"$dir/drop").listFiles()
      .map(_.getName).filter(_.startsWith("part"))
    assert(files.nonEmpty && files.forall(_.endsWith(".zst")),
      s"expected .zst parts, got ${files.mkString(",")}")
    // a .zst part really is zstd: magic number 28 B5 2F FD
    val part = new java.io.File(s"$dir/drop").listFiles()
      .filter(_.getName.endsWith(".zst")).head
    val magic = java.nio.file.Files.readAllBytes(part.toPath).take(4)
    assert(magic.sameElements(Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte)))
    val back = spark.read.text(s"$dir/drop").as[String].collect().sorted
    assert(back === rows.sorted.toArray)
  }

  test("json quarantine splits clean rows from raw corrupt lines") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ingest-json").toString
    val good = (1L to 100L).map(i => s"""{"doc_id":$i,"text":"doc $i"}""")
    val bad = Seq("{truncated", "not json at all", """{"doc_id":"x","text":3}""")
    spark.createDataset(scala.util.Random.shuffle(good ++ bad))
      .toDF("value").coalesce(1).write.text(s"$dir/drop")
    val schema = new StructType().add("doc_id", LongType).add("text", StringType)
    val parsed = Ingest.jsonWithQuarantine(spark, s"$dir/drop", schema)
    val g = Ingest.good(parsed)
    assert(g.count() === 100L)
    assert(g.agg(sum(col("doc_id"))).head.getLong(0) === (1L to 100L).sum)
    val q = Ingest.quarantined(parsed).as[String].collect().sorted
    // doc_id:"x" fails the LONG field parse -> quarantined with the
    // raw line, not silently nulled
    assert(q === bad.sorted.toArray)
    parsed.unpersist()
  }

  test("csv quarantine captures type-mismatched rows; parsed columns flow on") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ingest-csv").toString
    val lines = Seq("1,10", "2,notanumber", "3,30", "4,")
    spark.createDataset(lines).toDF("value").coalesce(1)
      .write.option("compression", "gzip").text(s"$dir/drop")
    val schema = new StructType().add("doc_id", LongType).add("n", LongType)
    val parsed = Ingest.csvWithQuarantine(spark, s"$dir/drop", schema)
    val g = Ingest.good(parsed).collect().map(r => (r.getLong(0), r.get(1)))
    // "4," parses: missing numeric is null, not corrupt — only the
    // unparseable token quarantines
    assert(g.map(_._1).sorted === Array(1L, 3L, 4L))
    val q = Ingest.quarantined(parsed).as[String].collect()
    assert(q === Array("2,notanumber"))
    parsed.unpersist()
  }
}
