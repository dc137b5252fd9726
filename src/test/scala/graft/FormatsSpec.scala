package graft

import java.nio.file.Files

import graft.operators.Candles
import graft.streaming.TransactionSimulator

/** Source/sink format breadth: the candle frame round-trips through
  * every columnar/text format Spark ships.
  */
class FormatsSpec extends SparkSpec {

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
