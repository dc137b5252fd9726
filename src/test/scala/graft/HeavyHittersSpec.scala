package graft

import org.apache.spark.sql.functions._

import graft.operators.{HeavyHitters, TextAnalysis}
import graft.sources.Tables

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** A skewed stream with known exact counts: item i appears
    * `base / (i+1)` times (Zipf-ish head over a long singleton tail).
    */
  private def zipfish(nHead: Int, base: Int, tail: Int): Seq[String] =
    (0 until nHead).flatMap(i => Seq.fill(base / (i + 1))(s"head_$i")) ++
      (0 until tail).map(i => s"tail_$i")

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("Misra–Gries guarantee: every item above N/(k+1) survives any partitioning") {
    val items = scala.util.Random.shuffle(zipfish(nHead = 20, base = 2000, tail = 3000))
    val exact = exactCounts(items)
    val n = items.size.toLong
    val k = 10
    for (parts <- Seq(1, 3, 8)) {
      val cand = HeavyHitters.candidates(
        items.toDF("token").repartition(parts), "token", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cand.size <= k)
      val mustHave = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
      assert(mustHave.nonEmpty, "test stream must exercise the guarantee")
      val missing = mustHave -- cand.keySet
      assert(missing.isEmpty, s"guaranteed-frequent items missing at $parts partitions: $missing")
      // estimates never overcount, and undercount at most N/(k+1)
      cand.foreach { case (t, est) =>
        val truth = exact(t)
        assert(est <= truth, s"$t overcounted: est=$est exact=$truth")
        assert((truth - est) * (k + 1) <= n, s"$t undercount above bound")
      }
    }
  }

  test("adversarial near-uniform stream (k below cardinality) keeps the bound") {
    // every item equally frequent and k < cardinality: constant
    // eviction pressure, no item guaranteed — the bound is the claim
    val items = scala.util.Random.shuffle(
      (0 until 40).flatMap(i => Seq.fill(50)(s"u_$i")))
    val n = items.size.toLong
    val k = 8
    val cand = HeavyHitters.candidates(items.toDF("token").repartition(5), "token", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cand.size <= k)
    cand.foreach { case (t, est) =>
      assert(est <= 50L)
      assert((50L - est) * (k + 1) <= n)
    }
  }

  test("certified frame pins both theorem flags TRUE on the documents corpus") {
    val toks = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens($"text")).as("token"))
    val out = HeavyHitters.certified(toks, "token", k = 30).collect()
    assert(out.nonEmpty, "certification set must be non-empty at test SF")
    out.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} not in sketch")
      assert(r.getBoolean(3), s"${r.getString(0)} estimate out of bound")
    }
    // the certified set is exactly the exact-count filter
    val total = toks.count()
    val expect = toks.groupBy("token").count()
      .filter(col("count") * 31 > total).count()
    assert(out.length === expect)
  }
}
