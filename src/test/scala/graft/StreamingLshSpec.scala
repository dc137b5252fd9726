package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.LshDedup
import graft.sources.Tables
import graft.streaming.{CandleStream, StreamingLsh}

/** Streaming LSH candidate mining vs the batch chain: equality when no
  * bucket overflows, the prefix-monotone superset contract when one
  * does, and cross-micro-batch state (pairs spanning the batch cut).
  */
class StreamingLshSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed candidates across micro-batches == batch candidatePairs (no overflow)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val input = MemoryStream[(Long, String)]
    val q = StreamingLsh.candidatePairs(input.toDF().toDF("doc_id", "text"))
      .toDF()
      .writeStream.format("memory").queryName("slsh_sink")
      .outputMode("append").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = pairs(spark.table("slsh_sink").distinct())
    val batch = pairs(LshDedup.minhashCandidates(
      Tables.documents(spark, "/root/testdata/sf0.001")))
    assert(streamed === batch && streamed.nonEmpty)

    // the cut must be load-bearing: some pair spans the two batches
    val b1Ids = b1.map(_._1).toSet
    val b2Ids = b2.map(_._1).toSet
    assert(streamed.exists { case (a, b) =>
      (b1Ids(a) && b2Ids(b)) || (b2Ids(a) && b1Ids(b)) },
      "no candidate pair spans the micro-batch cut; state restore is untested")
  }

  test("overflowed buckets latch: emission stops at the cap, state drops to a flag") {
    implicit val sqlCtx = spark.sqlContext
    // four identical docs share every bucket; cap 2 ⇒ only the first
    // pair is ever emitted, docs 3 and 4 emit nothing
    val input = MemoryStream[(Long, String)]
    val q = StreamingLsh.candidatePairs(
      input.toDF().toDF("doc_id", "text"), maxBucket = 2)
      .toDF()
      .writeStream.format("memory").queryName("slsh_cap_sink")
      .outputMode("append").start()
    val txt = "the same spam document body repeated verbatim in every copy"
    try {
      input.addData((1L, txt), (2L, txt))
      q.processAllAvailable()
      input.addData((3L, txt), (4L, txt))
      q.processAllAvailable()
    } finally q.stop()
    assert(pairs(spark.table("slsh_cap_sink").distinct()) === Set((1L, 2L)))
  }

  test("bounded file-source run matches the batch chain (the q_stream_neardup shape)") {
    spark.catalog.dropTempView("slsh_file_sink")
    val streamed = pairs(CandleStream.runBoundedToMemoryAppend(spark,
      StreamingLsh.candidatePairs(
        Tables.documentsStream(spark, "/root/testdata/sf0.001")).toDF(),
      "slsh_file_sink").distinct())
    val batch = pairs(LshDedup.minhashCandidates(
      Tables.documents(spark, "/root/testdata/sf0.001")))
    assert(streamed === batch && streamed.nonEmpty)
  }
}
