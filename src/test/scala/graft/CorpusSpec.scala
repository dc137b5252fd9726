package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.sources.Tables

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val chunks = Corpus.chunk(docs, chunkSize = 32, overlap = 8)

  test("packSequences conserves tokens and numbers sequences contiguously per bucket") {
    val packed = Corpus.packSequences(chunks, seqLen = 256, nBuckets = 8)
    // every chunk's tokens land in exactly one sequence
    val totalIn = chunks.agg(sum($"n_chunk_tokens")).as[Long].collect().head
    val totalOut = packed.agg(sum($"n_tokens")).as[Long].collect().head
    assert(totalOut === totalIn)
    // seq ids are 0..max contiguous within each bucket (offset div seqLen
    // can only advance by steps the chunk sizes allow — no holes when
    // chunks are smaller than seqLen)
    val perBucket = packed.groupBy("bucket")
      .agg(min($"seq_id").as("lo"), max($"seq_id").as("hi"), count(lit(1)).as("n"))
      .collect()
    perBucket.foreach { r =>
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("n") === r.getAs[Long]("hi") + 1,
        s"bucket ${r.getAs[Long]("bucket")} has holes")
    }
    // fully-packed sequences hold ~seqLen tokens: all but the last per
    // bucket reach at least seqLen - 31 (a chunk never exceeds 32)
    val lastPer = packed.groupBy("bucket").agg(max($"seq_id").as("seq_id"))
    val nonLast = packed.join(lastPer, Seq("bucket", "seq_id"), "left_anti")
    assert(nonLast.filter($"n_tokens" < 256 - 31).count() === 0)
  }

  test("packSequences is stable under input repartitioning") {
    val a = Corpus.packSequences(chunks, seqLen = 256, nBuckets = 8)
      .collect().map(_.toSeq).toSet
    val b = Corpus.packSequences(chunks.repartition(13), seqLen = 256, nBuckets = 8)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("epochShuffle is a deterministic permutation: every doc once, " +
    "contiguous positions per shard, seed changes the order") {
    val n = docs.count()
    val sh = Corpus.epochShuffle(docs, seed = 7L, nShards = 8)
    assert(sh.count() === n)
    assert(sh.select("doc_id").distinct().count() === n)
    // positions are 1..count(shard) with no holes
    val bad = sh.groupBy("shard")
      .agg(min($"pos").as("lo"), max($"pos").as("hi"), count(lit(1)).as("cnt"))
      .filter($"lo" =!= 1L || $"hi" =!= $"cnt")
    assert(bad.count() === 0)
    // stable under repartitioning (rand(seed) would fail this)
    val a = sh.collect().map(_.toSeq).toSet
    val b = Corpus.epochShuffle(docs.repartition(13), seed = 7L, nShards = 8)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    // a different seed produces a genuinely different order
    val other = Corpus.epochShuffle(docs, seed = 8L, nShards = 8)
      .collect().map(_.toSeq).toSet
    assert(a !== other)
  }
}
