package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{BandStore, DsirStore, PostingStore}
import graft.sources.Tables

/** Engine-driven batch re-delivery: a streaming ingest crashed
  * MID-foreachBatch (DSIR + posting appends landed, band append did
  * not, epoch uncommitted) and restarted from its checkpoint replays
  * the whole batch — the stores must converge to the crash-free
  * run's bytes. This is the end-to-end form of the double-append
  * idempotence the store specs pin by hand: here Structured
  * Streaming, not the test, decides to re-deliver.
  */
class ReplaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("mid-batch crash + checkpoint restart converges every doc store to the clean run") {
    val work = Files.createTempDirectory("replay-spec").toString
    val docs = Tables.documents(spark, sf)
    ReplayGate.splitSource(docs, "doc_id", 3, s"$work/src")

    val clean = ReplayGate.runDocIngest(spark, sf, s"$work/src",
      s"$work/clean", s"$work/clean-chk", Map.empty)
    val crashed = ReplayGate.runDocIngest(spark, sf, s"$work/src",
      s"$work/crashed", s"$work/crashed-chk",
      Map(1L -> "mid", 2L -> "pre"))

    assert(clean.crashes === 0 && clean.restarts === 0)
    assert(crashed.crashes === 2 && crashed.restarts === 2)
    // the mid crash left REAL partial state for the replay to heal —
    // without this the test would pass vacuously
    assert(crashed.partiallyAppliedDocs > 0L,
      "mid-batch crash must leave docs in the DSIR store but not the band store")
    // engine actually re-delivered: more foreachBatch invocations
    // than distinct batch ids
    assert(crashed.batches.length > crashed.batches.distinct.length)

    def rows(sub: String) = spark.read.parquet(s"$work/$sub")
      .collect().map(_.toString).sorted.toSeq
    assert(rows("crashed/dsir") === rows("clean/dsir"))
    assert(rows("crashed/band") === rows("clean/band"))
    assert(rows("crashed/posting") === rows("clean/posting"))

    // and the healed store equals a from-scratch batch build
    val full = graft.operators.Curation
      .dsirCountTable(docs, col("source") === "src0")
      .collect().map(_.toString).sorted.toSeq
    val stored = DsirStore.counts(spark, s"$work/crashed/dsir")
      .select(col("doc_id"), col("is_t"), col("b"), col("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(stored === full)
    // no doc's counts were double-appended
    assert(DsirStore.counts(spark, s"$work/crashed/dsir")
      .groupBy(col("doc_id"), col("is_t"), col("b"))
      .count().filter(col("count") > 1).count() === 0L)
    assert(PostingStore.postings(spark, s"$work/crashed/posting")
      .groupBy(col("doc_id"), col("term"))
      .count().filter(col("count") > 1).count() === 0L)
    assert(BandStore.bandTable(spark, s"$work/crashed/band")
      .groupBy(col("doc_id"), col("band"))
      .count().filter(col("count") > 1).count() === 0L)
  }

  test("stateful candle agg crashed between merge and commit converges to the batch answer") {
    val work = Files.createTempDirectory("replay-candle").toString
    val txns = graft.operators.Candles.transactions(spark, sf)
      .select(col("symbol"), col("price"), col("quantity"), col("ts"))
    ReplayGate.splitSourceByTime(txns, "ts", 3, s"$work/src")

    val crashed = ReplayGate.runCandleIngest(spark, sf, s"$work/src",
      s"$work/crashed", s"$work/crashed-chk",
      Map(1L -> "mid", 2L -> "pre"))
    assert(crashed.crashes === 2 && crashed.restarts === 2)
    assert(crashed.batches.length > crashed.batches.distinct.length)

    // state-store rollback + update-mode re-emission + merge
    // idempotence must land exactly on the batch engine's rollup
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(graft.operators.Candles.candleColumns: _*)
        .collect().map(_.toString).sorted.toSeq
    assert(key(spark.read.parquet(s"$work/crashed/candles")) ===
      key(graft.operators.Candles.rollup(
        graft.operators.Candles.minuteCandles(txns),
        graft.model.CandleTimeFrame.Hour)))
  }

  test("staged pipeline crashed at EVERY tier boundary resumes without recompute, bit-identical") {
    val work = Files.createTempDirectory("replay-pipe").toString
    val (vsInMem, perTier) = ReplayGate.runPipelineResume(spark, sf, work)
    assert(vsInMem, "staged report != in-memory (localCheckpoint) report")
    assert(perTier.map(_.tier) ===
      Seq("report_head", "sv5", "cp", "sv6", "sv7"))
    perTier.foreach { t =>
      assert(t.crashes === 1, s"tier ${t.tier}: crash hook fired ${t.crashes}x")
      assert(t.matches,
        s"tier ${t.tier}: resumed staged report != uninterrupted staged report")
      assert(t.untouched,
        s"tier ${t.tier}: resume rewrote tiers that were already complete")
    }
    // knob-fingerprint guard: resuming the same tierDir with
    // different knobs must fail loudly, not mix funnels
    val docs = Tables.documents(spark, sf)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Curation.fullPipelineStaged(docs,
        s"$work/tiers-crash-cp", minTokens = 41)
    }
    assert(e.getMessage.contains("different knobs"))
  }
}
