package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, PostingStore}
import graft.sources.Tables

/** Persisted inverted index: lookups must equal the direct tf
  * computation, appends must be incremental and idempotent, and the
  * bucket layout must actually prune.
  */
class PostingStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)

  private def key(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.select("term", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("store-backed lookup equals the direct tf computation") {
    val store = Files.createTempDirectory("posting-store").toString
    PostingStore.write(docs, store)
    val probe = Seq("the", "and", "zzz-not-a-term").toDF("term")
    val got = key(PostingStore.lookup(spark, store, probe))
    val want = key(PostingStore.build(docs)
      .join(probe, Seq("term"), "left_semi")
      .select(col("term"), col("doc_id"), col("tf")))
    assert(got === want && got.nonEmpty)
  }

  test("lookup prunes partitions dynamically (DPP in the plan)") {
    val store = Files.createTempDirectory("posting-store-dpp").toString
    PostingStore.write(docs, store)
    // the realistic probe shape: terms out of a filtered scan (DPP
    // requires a selective build side — a bare literal LocalRelation
    // is planned without the pruning subquery)
    val probe = docs.filter($"doc_id" < 5)
      .select(explode(graft.operators.TextAnalysis.tokens($"text")).as("term"))
    val p = PostingStore.lookup(spark, store, probe)
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$p")
  }

  test("streaming document ingest maintains the index via foreachBatch append") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("posting-stream").toString
    val corpus = docs.filter($"doc_id" >= 100)
    PostingStore.write(corpus, store)

    val arriving = docs.filter($"doc_id" < 100)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val (b1, b2) = arriving.splitAt(arriving.length / 2)

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        PostingStore.append(batch, store)
      }
      .start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // the streamed-in store equals a from-scratch build over everything
    assert(key(PostingStore.postings(spark, store)) ===
      key(PostingStore.build(docs)
        .select(col("term"), col("doc_id"), col("tf"))))
  }

  test("append is incremental and idempotent; compact preserves rows") {
    val store = Files.createTempDirectory("posting-store-incr").toString
    val train = docs.filter(Corpus.splitLabel($"doc_id", 0.8) === "train")
    val eval = docs.filter(Corpus.splitLabel($"doc_id", 0.8) === "eval")
    PostingStore.write(train, store)
    PostingStore.append(eval, store)
    val full = key(PostingStore.build(docs)
      .select(col("term"), col("doc_id"), col("tf")))
    assert(key(PostingStore.postings(spark, store)) === full)
    // foreachBatch-retry idempotency: re-append adds nothing
    PostingStore.append(eval, store)
    assert(PostingStore.postings(spark, store).count() === full.size)
    // compaction rewrites without changing a row
    PostingStore.compact(spark, store)
    assert(key(PostingStore.postings(spark, store)) === full)
  }
}
