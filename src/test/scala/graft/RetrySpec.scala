package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Mechanics of the retry-determinism gate's fault injection
  * (graft.Chaos). The full bit-exact-under-retry proof runs in
  * graft.RetryGate under local[32,4] — the shared spec session is
  * plain local[32], where spark.task.maxFailures is 1 and a first
  * failure is fatal BY DESIGN; this spec uses exactly that to prove
  * the injection really fires, and pins the off-by-default contract
  * the 173-query Verify gate depends on.
  */
class RetrySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("chaos injection is off by default and a conf-keyed no-op on values") {
    assert(spark.conf.get(Chaos.ConfKey, "false") === "false")
    // the identity wrapper must not change a single value
    val base = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Chaos.failOnce(base).schema === base.schema)
    // (cannot EXECUTE the wrapped frame here: first attempts fail and
    // local[32] has no retries — exactly what the next test pins)
  }

  test("slowFirst is value-neutral and schema-preserving") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val wrapped = Chaos.slowFirst(base.repartition(2), sleepMs = 1L)
    assert(wrapped.schema === base.schema)
    // executable under local[32]: slowFirst delays, never fails
    assert(wrapped.collect().map(_.toString).sorted ===
      base.collect().map(_.toString).sorted)
  }

  test("fetchFailOnce recovers via stage resubmission even under local[32]") {
    // FetchFailed does NOT count against spark.task.maxFailures —
    // the DAGScheduler resubmits the map stage instead — so unlike
    // every other injector this one recovers even in the shared
    // local[32] session. The collect SUCCEEDING with the right
    // values, with the thrown-counter ≥ 1, proves (a) a real
    // FetchFailedException fired in the post-shuffle stage, (b) it
    // named a resolvable parent shuffle (a dangling id kills the
    // DAGScheduler event loop and with it this SparkContext), and
    // (c) the recompute produced identical values.
    Chaos.resetFetchState()
    val agg = Seq((1L, 1L), (2L, 2L), (1L, 3L)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    val rows = Chaos.fetchFailOnce(agg).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows === Seq((1L, 4L), (2L, 2L)))
    assert(Chaos.fetchFailuresThrown.get() >= 1L,
      "the real FetchFailedException path must have fired " +
        "(a shuffle-less fallback would leave the counter at 0)")
    Chaos.resetFetchState()
    // the SparkContext survived (the dangling-id failure mode kills it)
    assert(spark.range(3).count() === 3)
  }

  test("chaos injection fires on first attempts (fatal under local[32])") {
    spark.conf.set(Chaos.ConfKey, "true")
    try {
      val e = intercept[Exception] {
        Tables.documents(spark, sf).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("graft chaos")),
        s"expected the injected failure, got: $e")
    } finally spark.conf.set(Chaos.ConfKey, "false")
    // and with the conf back off the same read succeeds untouched
    assert(Tables.documents(spark, sf).count() > 0)
  }
}
