package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IvfStore, Similarity}
import graft.sources.Tables

/** Persisted IVF index: probe-after-reload must equal the inline
  * build, freshness drift must be observable, and the cell layout
  * must actually prune.
  */
class IvfStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)

  test("store-backed probe equals the inline ivfSearch bit-for-bit") {
    val store = Files.createTempDirectory("ivf-store").toString
    IvfStore.write(emb, store, nCells = 16)
    val queries = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("rank"), col("vec_id"),
        floor(col("sim") * 1e6).cast("long").as("sm"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
    val inline = key(Similarity.ivfSearch(
      Similarity.ivfIndex(emb, nCells = 16),
      Similarity.ivfCentroids(emb, nCells = 16), queries, topK = 10, nProbe = 4))
    val stored = key(IvfStore.search(spark, store, queries, topK = 10, nProbe = 4))
    assert(stored === inline && inline.nonEmpty)
  }

  test("staleness reports drift: fresh build is clean, corpus growth shows as missing") {
    import spark.implicits._
    val store = Files.createTempDirectory("ivf-fresh").toString
    IvfStore.write(emb, store, nCells = 8)
    val clean = IvfStore.staleness(spark, store, emb).collect()(0)
    assert(clean.getAs[Long]("n_missing") === 0L)
    assert(clean.getAs[Long]("n_orphaned") === 0L)
    assert(clean.getAs[Long]("n_indexed") === emb.count())

    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val grown = emb.select(col("vec_id"), col("embedding")).unionByName(
      Seq((9000001L, Array.fill(dim)(0.25f)), (9000002L, Array.fill(dim)(0.5f)))
        .toDF("vec_id", "embedding"))
    val drifted = IvfStore.staleness(spark, store, grown).collect()(0)
    assert(drifted.getAs[Long]("n_missing") === 2L)
    assert(drifted.getAs[Long]("n_orphaned") === 0L)
  }

  test("probes prune the cell-partitioned index files dynamically") {
    val store = Files.createTempDirectory("ivf-dpp").toString
    IvfStore.write(emb, store, nCells = 16)
    val p = IvfStore.search(spark, store, emb.filter(col("vec_id") < 2),
      topK = 5, nProbe = 2).queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning over the cell layout in:\n$p")
  }

  test("append folds a batch in: probe equals inline search over corpus ∪ batch, staleness clears") {
    import spark.implicits._
    val store = Files.createTempDirectory("ivf-append").toString
    val corpus = emb.filter(col("vec_id") >= 100)
    val batch = emb.filter(col("vec_id") < 100)
    IvfStore.write(corpus, store, nCells = 8)
    assert(IvfStore.staleness(spark, store, emb).collect()(0)
      .getAs[Long]("n_missing") === batch.count())

    IvfStore.append(batch, store)
    val after = IvfStore.staleness(spark, store, emb).collect()(0)
    assert(after.getAs[Long]("n_missing") === 0L)
    assert(after.getAs[Long]("n_indexed") === emb.count())

    // foreachBatch-retry idempotency: a replayed append adds nothing —
    // a duplicated vec_id would surface twice in every top-k it reaches
    IvfStore.append(batch, store)
    assert(IvfStore.index(spark, store).count() === emb.count())
    assert(IvfStore.index(spark, store).groupBy(col("vec_id"))
      .count().filter(col("count") > 1).count() === 0L)

    // value-exact vs the inline path over the union with the SAME
    // (corpus-derived) centroids — appends never re-train
    val queries = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("rank"), col("vec_id"),
        floor(col("sim") * 1e6).cast("long").as("sm"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
    val cents = Similarity.ivfCentroids(corpus, nCells = 8)
    val inline = key(Similarity.ivfSearch(
      Similarity.ivfAssign(emb, cents), cents, queries, topK = 10, nProbe = 3))
    val stored = key(IvfStore.search(spark, store, queries, topK = 10, nProbe = 3))
    assert(stored === inline && stored.nonEmpty)
  }

  test("streaming embedding ingest maintains the store via foreachBatch append") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("ivf-stream").toString
    val corpus = emb.filter(col("vec_id") >= 100)
    IvfStore.write(corpus, store, nCells = 8)

    val arriving = emb.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = arriving.splitAt(arriving.length / 2)

    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IvfStore.append(batch, store)
      }
      .start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val after = IvfStore.staleness(spark, store, emb).collect()(0)
    assert(after.getAs[Long]("n_missing") === 0L)
    assert(after.getAs[Long]("n_indexed") === emb.count())
    // the streamed-in store serves probes identically to a batch
    // assignment over the union with the same corpus centroids
    val queries = emb.filter(col("vec_id") < 3)
    val cents = Similarity.ivfCentroids(corpus, nCells = 8)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("rank"), col("vec_id"),
        floor(col("sim") * 1e6).cast("long").as("sm"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(key(IvfStore.search(spark, store, queries, topK = 10, nProbe = 3)) ===
      key(Similarity.ivfSearch(Similarity.ivfAssign(emb, cents), cents,
        queries, topK = 10, nProbe = 3)))
  }

  test("Lloyd-refined build matches or beats the sampled-centroid build on recall") {
    val queries = emb.filter(col("vec_id") < 20)
    val truth = Similarity.knnBrute(emb, queries, topK = 10)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(store: String): Double = {
      val got = IvfStore.search(spark, store, queries, topK = 10, nProbe = 4)
        .select("query_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }

    val sampledStore = Files.createTempDirectory("ivf-sampled").toString
    IvfStore.write(emb, sampledStore, nCells = 16)
    val refinedStore = Files.createTempDirectory("ivf-refined").toString
    IvfStore.write(emb, refinedStore, nCells = 16, lloydIters = 2)

    val (rSampled, rRefined) = (recall(sampledStore), recall(refinedStore))
    // k-means minimizes within-cell variance, not fixed-nProbe recall,
    // so strict >= is not a theorem — allow a small tolerance so a
    // data-generator tweak can't fail the suite on correct code, while
    // still catching a refinement that actually harms retrieval
    assert(rRefined >= rSampled - 0.05,
      s"Lloyd refinement degraded recall: sampled=$rSampled refined=$rRefined")
    assert(rRefined > 0.5, s"refined recall implausibly low: $rRefined")
  }
}
