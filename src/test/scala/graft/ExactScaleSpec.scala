package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, ExactScale, LshDedup, Similarity}

/** The exact Θ(n²) ground-truth paths must refuse oversized inputs
  * unless the caller explicitly opts in (round-6 verdict: "a pipeline
  * can never reach them by accident").
  */
class ExactScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = (0 until 20)
    .map(i => (i.toLong, Array(i.toFloat, (i % 3).toFloat, 1.0f)))
    .toDF("vec_id", "embedding")

  private lazy val docs = (0 until 20)
    .map(i => (i.toLong, s"alpha beta gamma delta token$i epsilon zeta"))
    .toDF("doc_id", "text")

  private def refused(body: => Any): Unit = {
    val e = intercept[IllegalArgumentException](body)
    assert(e.getMessage.contains("force=true"), e.getMessage)
    assert(e.getMessage.contains("sibling"), e.getMessage)
  }

  test("knnGraph refuses above the guard, runs with force") {
    refused(Similarity.knnGraph(vecs, k = 3, maxExactRows = 10).count())
    assert(Similarity.knnGraph(vecs, k = 3, maxExactRows = 10, force = true).count() > 0)
  }

  test("blockedNearDupPairs refuses above the guard, runs with force") {
    refused(Similarity.blockedNearDupPairs(vecs, 0.1, maxExactRows = 10).count())
    assert(Similarity.blockedNearDupPairs(
      vecs, 0.1, maxExactRows = 10, force = true).count() > 0)
  }

  test("cosineNearDupPairs refuses above the guard, runs with force") {
    refused(Similarity.cosineNearDupPairs(vecs, 0.1, maxExactRows = 10).count())
    assert(Similarity.cosineNearDupPairs(
      vecs, 0.1, maxExactRows = 10, force = true).count() > 0)
  }

  test("exactJaccardPairs (both variants) refuses above the guard, runs with force") {
    refused(LshDedup.exactJaccardPairs(docs, 0.2, maxExactRows = 10).count())
    refused(LshDedup.exactJaccardPairs(
      docs, 0.2, prefixFilter = Some(true), maxExactRows = 10).count())
    refused(LshDedup.exactJaccardPairs(
      docs, 0.2, prefixFilter = Some(false), maxExactRows = 10).count())
    assert(LshDedup.exactJaccardPairs(
      docs, 0.2, maxExactRows = 10, force = true).count() > 0)
  }

  test("exactJaccardPairs size gate: counted under the gate, prefix above or unguarded") {
    // the auto-selected path is a pure plan choice (both miners are
    // exact, equality spec'd) — this pins the selection RULE so a
    // future refactor can't silently flip the sf1 default back to
    // the 2.2–8.4× slower counted path
    assert(LshDedup.chooseCountedMiner(5000L))
    assert(LshDedup.chooseCountedMiner(LshDedup.CountedMinerMaxDocs))
    assert(!LshDedup.chooseCountedMiner(LshDedup.CountedMinerMaxDocs + 1))
    assert(!LshDedup.chooseCountedMiner(50000L))
    // force=true skips the count (−1): no size info ⇒ the scale path
    assert(!LshDedup.chooseCountedMiner(-1L))
  }

  test("dedupCorpusExact threads the guard through") {
    refused(Dedup.dedupCorpusExact(docs, 0.2, maxExactRows = 10).count())
    assert(Dedup.dedupCorpusExact(
      docs, 0.2, maxExactRows = 10, force = true).count() > 0)
  }

  test("inputs at or below the ceiling pass untouched") {
    assert(ExactScale.check(vecs, "x", "y", maxExactRows = 20).count() == 20)
    assert(Similarity.knnGraph(vecs, k = 2, maxExactRows = 20).count() > 0)
  }
}
