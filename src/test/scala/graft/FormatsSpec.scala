package graft

import java.nio.file.Files

import graft.operators.Candles
import graft.streaming.TransactionSimulator

/** Source/sink format breadth: the candle frame round-trips through
  * every columnar/text format Spark ships.
  */
class FormatsSpec extends SparkSpec {

  test("corrupt-line quarantine: good rows flow, bad lines keep their raw text") {
    import org.apache.spark.sql.types._
    import graft.sources.Ingest
    val dir = java.nio.file.Files.createTempDirectory("quarantine").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "fine"}""",
        """{"doc_id": oops not json""",
        """{"doc_id": 2, "text": "also fine"}""",
        """garbage line"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val parsed = Ingest.jsonWithQuarantine(spark, s"$dir/in.jsonl", schema)
    try {
      val good = Ingest.good(parsed).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(good === Set((1L, "fine"), (2L, "also fine")))
      // the quarantine preserves the ORIGINAL bytes for review/replay
      val bad = Ingest.quarantined(parsed).collect().map(_.getString(0)).toSet
      assert(bad === Set("""{"doc_id": oops not json""", "garbage line"))
    } finally parsed.unpersist()
  }

  test("candles round-trip through parquet, orc, json and csv") {
    val candles = Candles.multiTimeframe(TransactionSimulator.batch(spark, 100))
      .orderBy("timeframe", "symbol", "window_start")
    val want = candles.collect().toSeq
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val dir = Files.createTempDirectory(s"fmt-$fmt").toString
      candles.write.format(fmt).option("header", "true").mode("overwrite").save(dir)
      val back = spark.read.format(fmt)
        .option("header", "true").option("inferSchema", "true")
        .schema(candles.schema) // text formats need the schema pinned
        .load(dir)
        .orderBy("timeframe", "symbol", "window_start")
      assert(back.collect().toSeq === want, s"format $fmt")
    }
  }
}
