package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.LshDedup

/** Streaming MinHash-LSH near-dup candidate mining — ingest-time
  * near-dup detection for a document stream, the LSH analog of
  * Dedup.dropExactDuplicatesStream.
  *
  * Shape: the banding front is the same stateless per-row expression
  * chain as batch ([[LshDedup.bandTable]] — shingle → signature →
  * band, no shuffle), then ONE keyed state lookup per (band,
  * band_hash) bucket: each bucket remembers the doc_ids it has seen
  * (capped at `maxBucket`) and every arriving doc emits a candidate
  * pair against each remembered member. Pairs are normalized
  * (doc_a < doc_b) so output is deterministic under micro-batch
  * arrival reorderings; the same pair may surface from several bands —
  * downstream consumers `distinct` (exactly as the batch path does).
  *
  * Skew-cap contract vs batch: batch candidatePairs drops an over-cap
  * bucket RETROACTIVELY (its pairs never existed); a stream cannot
  * retract emitted pairs, so the guard here is prefix-monotone — once
  * a bucket reaches `maxBucket` members it stops emitting and drops
  * its member list (state for a spammed bucket is the cap + a flag,
  * never unbounded). Streamed candidates are therefore a SUPERSET of
  * the batch candidates over the same corpus, with equality whenever
  * no bucket overflows — StreamingLshSpec locks both directions.
  *
  * State size: ≤ maxBucket ids per distinct non-overflowed bucket, the
  * cap + flag for overflowed ones. Unbounded bucket lifetime by
  * design (near-dup memory spans the corpus); bound it operationally
  * by restarting from a fresh checkpoint per corpus epoch, or fold
  * the corpus into a persisted band table and use
  * [[graft.operators.BandStore.incrementalCandidates]] per batch —
  * this operator is the per-document-latency variant.
  */
object StreamingLsh {

  final case class CandidatePair(doc_a: Long, doc_b: Long)

  /** Per-bucket state: members seen so far; `overflowed` latches once
    * the cap is hit and the member list is dropped.
    */
  final case class BucketState(ids: List[Long], overflowed: Boolean)

  def candidatePairs(docs: DataFrame, k: Int = 64, bands: Int = 16,
                     n: Int = 3, maxBucket: Int = 1000): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    LshDedup.bandTable(docs, k, bands, n)
      .select(col("band"), col("band_hash"), col("doc_id"))
      .as[(Int, Long, Long)]
      .groupByKey { case (band, hash, _) => (band, hash) }
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update(maxBucket))
  }

  private def update(maxBucket: Int)(
      key: (Int, Long), rows: Iterator[(Int, Long, Long)],
      state: GroupState[BucketState]): Iterator[CandidatePair] = {
    var s = state.getOption.getOrElse(BucketState(Nil, overflowed = false))
    val out = List.newBuilder[CandidatePair]
    rows.foreach { case (_, _, docId) =>
      if (!s.overflowed && !s.ids.contains(docId)) {
        if (s.ids.length >= maxBucket)
          s = BucketState(Nil, overflowed = true)
        else {
          s.ids.foreach { prev =>
            out += CandidatePair(math.min(prev, docId), math.max(prev, docId))
          }
          s = s.copy(ids = docId :: s.ids)
        }
      }
    }
    state.update(s)
    out.result().iterator
  }
}
