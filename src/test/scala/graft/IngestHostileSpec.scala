package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.{Ingest, ZstdJniCodec}

/** Hostile-corpus gate for the quarantine roundtrip (VERDICT r12 #1):
  * the shared /root/testdata documents text is provably tame (zero
  * newlines, quotes, commas, non-ASCII — checked round 12), so every
  * green oracle run certifies NOTHING about the risky surface of
  * q_ingest_quarantine — the to_json/.text()/zstd/gzip roundtrip of
  * text a real corpus drop actually contains. This spec feeds that
  * surface directly: embedded LF/CR/CRLF, double quotes, commas,
  * backslashes, tabs, NUL, non-ASCII, non-BMP surrogate pairs,
  * U+2028/U+2029, empty and NULL text — and asserts the eight
  * aggregates of [[Ingest.quarantineRoundtrip]] against CLOSED-FORM
  * values computed here with `codePointCount` (Spark `length` counts
  * code points via UTF8String.numChars, NOT Java UTF-16 units; DuckDB
  * `length` agrees — the spec would catch either side drifting to
  * UTF-16 semantics on the non-BMP rows).
  */
class IngestHostileSpec extends SparkSpec {

  // (doc_id, source, text) — ids chosen so the corruption rules hit:
  // 0 lands in BOTH corrupt buckets, 50/100 json-corrupt, 71/142
  // csv-corrupt; everything else is good-side hostile text.
  private val corpus: Seq[(Long, String, String)] = Seq(
    (0L, "src0", "both corrupt buckets"),
    (1L, "src1", "line1\nline2"),
    (2L, "src2", "cr\rmid"),
    (3L, "src3", "crlf\r\nmid"),
    (4L, "src4", "quote\"inside"),
    (5L, "src5", "comma,sep,values"),
    (6L, "src6", "back\\slash and \"quoted, csv\""),
    (7L, "src7", "tab\there"),
    (8L, "src8", "nul\u0000char"),
    (9L, "src9", "accents éàü and 中文漢字"),
    (10L, "srcA", "emoji 😀 pair and 🤖"), // non-BMP
    (11L, "srcB", "ls\u2028ps\u2029ends"),
    (12L, "srcC", ""),
    (13L, "srcD", null), // good-side NULL text: the r12 vanishing-row class
    (14L, "srcE", " leading and trailing "),
    (15L, "srcF", "{\"looks\":\"like json\"}"),
    (16L, "srcG", "16,999"), // text that mimics our own csv framing
    (17L, null, "null source"),
    (18L, "srcI", "x" * 10000),
    (50L, "s50", "corrupt json bucket\nwith newline"),
    (71L, "s71", null), // corrupt-side NULL text
    (100L, "s100", "another json corrupt 😀"),
    (142L, "s142", "another csv corrupt"))

  /** Spark/DuckDB `length` semantics: CODE POINTS. */
  private def cps(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Closed-form replica of Ingest.recordFingerprint: Σ (first 15 hex
    * chars of md5(utf8 bytes) as a 60-bit int) mod 2⁶¹.
    */
  private def fp(recs: Seq[String]): Long =
    recs.map { r =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      BigInt(java.lang.Long.parseLong(hex, 16))
    }.sum.mod(BigInt(1L << 61)).toLong

  test("quarantine roundtrip matches closed-form aggregates on hostile text") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "source", "text")
    val tmp = Files.createTempDirectory("graft-hostile").toString
    val row: Row = Ingest.quarantineRoundtrip(spark, docs, tmp).head()

    val jsonGood = corpus.filter(_._1 % 50 != 0)
    val jsonBad = corpus.filter(_._1 % 50 == 0)
    val csvGood = corpus.filter(_._1 % 71 != 0)
    val csvBad = corpus.filter(_._1 % 71 == 0)

    def f(name: String): Long = row.getLong(row.fieldIndex(name))
    assert(f("n_json_good") === jsonGood.size.toLong)
    assert(f("sum_json_good_ids") === jsonGood.map(_._1).sum)
    assert(f("sum_json_good_text_len") ===
      jsonGood.flatMap(r => Option(r._3)).map(cps).sum)
    assert(f("n_json_quarantined") === jsonBad.size.toLong)
    assert(f("sum_json_quarantined_len") ===
      jsonBad.map(r => cps("{corrupt drop line for doc " + r._1)).sum)
    // the csv good COUNT must include the NULL-text rows (doc 13): the
    // pre-fix concat built a NULL line, the text writer emitted an
    // empty line, and the csv reader silently dropped it
    assert(f("n_csv_good") === csvGood.size.toLong)
    assert(f("sum_csv_good_n") ===
      csvGood.flatMap(r => Option(r._3)).map(cps).sum)
    assert(f("n_csv_quarantined") === csvBad.size.toLong)
    assert(f("sum_csv_quarantined_len") ===
      csvBad.map(r => cps(r._1.toString + ",notanumber")).sum)
    // content-addressable diagnostics: the quarantine fingerprints
    // match the md5-sum closed form over the exact raw-record bytes
    assert(f("json_quarantine_fp") ===
      fp(jsonBad.map(r => "{corrupt drop line for doc " + r._1)))
    assert(f("csv_quarantine_fp") ===
      fp(csvBad.map(r => r._1.toString + ",notanumber")))
  }

  test("quarantine aggregates are invariant to input partitioning (1 and 13 parts)") {
    import spark.implicits._
    // single-partition and many-partition drops write one vs many
    // files per format; the aggregates (and fingerprints — Σ of
    // per-record hashes, so file/partition order cannot matter) must
    // land on the same bits. Kills the "parse split depends on file
    // layout" environment hypothesis for the driver divergence.
    val docs = corpus.toDF("doc_id", "source", "text")
    val rows = Seq(1, 13).map { p =>
      Ingest.quarantineRoundtrip(spark, docs.repartition(p),
        Files.createTempDirectory(s"graft-hostile-p$p").toString).head()
    }
    assert(rows(0) === rows(1))
    assert(rows(0).getLong(rows(0).fieldIndex("n_json_good")) ===
      corpus.count(_._1 % 50 != 0).toLong)
  }

  test("jsonl zstd roundtrip is VALUE-exact on hostile text, not just length-exact") {
    import spark.implicits._
    ZstdJniCodec.register(spark)
    val dir = Files.createTempDirectory("graft-hostile-json").toString
    val docs = corpus.toDF("doc_id", "source", "text")
    docs.select(to_json(struct(col("doc_id"), col("source"), col("text")))
        .as("value"))
      .write.option("compression", classOf[ZstdJniCodec].getName)
      .text(s"$dir/drop")
    val schema = new StructType()
      .add("doc_id", LongType).add("source", StringType)
      .add("text", StringType)
    val parsed = Ingest.jsonWithQuarantine(spark, s"$dir/drop", schema)
    assert(Ingest.quarantined(parsed).count() === 0L)
    val back = Ingest.good(parsed)
      .as[(Long, Option[String], Option[String])].collect()
      .map(t => (t._1, t._2.orNull, t._3.orNull)).sortBy(_._1)
    assert(back === corpus.sortBy(_._1).toArray,
      "to_json -> zstd text -> read.json must restore every code point")
    parsed.unpersist()
  }

  test("NULL text row survives the csv drop as an explicit empty field") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hostile-null").toString
    val docs = Seq((1L, "a", "ten chars!"), (2L, "b", null: String),
      (3L, "c", "")).toDF("doc_id", "source", "text")
    val row = Ingest.quarantineRoundtrip(spark, docs, dir).head()
    def f(name: String): Long = row.getLong(row.fieldIndex(name))
    assert(f("n_csv_good") === 3L) // 2L present despite NULL text
    assert(f("sum_csv_good_n") === 10L) // NULL skipped, "" counts 0
    assert(f("n_json_good") === 3L)
    assert(f("sum_json_good_text_len") === 10L)
  }
}
