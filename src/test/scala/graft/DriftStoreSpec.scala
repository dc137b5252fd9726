package graft

import org.apache.spark.sql.functions._

import graft.operators.{DriftStore, Similarity}

/** DriftStore: additive fold equality vs the one-shot screen, the
  * batch-id retry idempotence probe, and null-pos group folding
  * (empty embeddings spanning batches).
  */
class DriftStoreSpec extends SparkSpec {
  import spark.implicits._

  private val cohort = pmod(col("vec_id"), lit(2))

  test("three-batch fold == one-shot embedDrift; re-delivered batch is a no-op") {
    val b0 = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(0.5f, -0.5f)))
    val b1 = Seq((2L, Seq(-1.0f, 4.0f)), (3L, Seq.empty[Float]))
    val b2 = Seq((4L, Seq(0.25f, 0.75f)), (-5L, Seq(2.0f, 2.0f)))
    def df(s: Seq[(Long, Seq[Float])]) = s.toDF("vec_id", "embedding")

    val store = java.nio.file.Files
      .createTempDirectory("drift-store-spec").toString + "/st"
    DriftStore.write(df(b0), cohort, store, 0L)
    DriftStore.append(df(b1), cohort, store, 1L)
    DriftStore.append(df(b1), cohort, store, 1L) // foreachBatch retry
    DriftStore.append(df(b2), cohort, store, 2L)

    val folded = DriftStore.screen(spark, store).collect()(0)
    val oneShot = Similarity.embedDrift(df(b0 ++ b1 ++ b2), cohort)
      .collect()(0)
    assert(folded === oneShot)
    // counts prove the double-append did NOT double: 6 vectors total
    assert(folded.getLong(0) + folded.getLong(1) === 6L)
    // the folded sums frame is shaped like a fresh driftSums — same
    // row set including the null-pos group from b1's empty embedding
    val foldedSums = DriftStore.sums(spark, store).collect()
      .map(_.toString).sorted.toSeq
    val freshSums = Similarity.driftSums(df(b0 ++ b1 ++ b2), cohort)
      .collect().map(_.toString).sorted.toSeq
    assert(foldedSums === freshSums)

    // compaction: batches×dims rows collapse to dims+1, screen
    // unchanged; the preserved max batch_id keeps the replay probe
    // correct (a re-delivered LAST batch still no-ops) while a new
    // batch folds on top
    DriftStore.compact(spark, store)
    assert(spark.read.parquet(store).count() === 3L) // 2 dims + null-pos
    assert(DriftStore.screen(spark, store).collect()(0) === oneShot)
    DriftStore.append(df(b2), cohort, store, 2L) // replayed last batch
    assert(DriftStore.screen(spark, store).collect()(0) === oneShot)
    val b3 = Seq((6L, Seq(1.0f, 1.0f)), (7L, Seq(-2.0f, 0.5f)))
    DriftStore.append(df(b3), cohort, store, 3L)
    val grown = DriftStore.screen(spark, store).collect()(0)
    val oneShotGrown = Similarity.embedDrift(
      df(b0 ++ b1 ++ b2 ++ b3), cohort).collect()(0)
    assert(grown === oneShotGrown)
  }
}
