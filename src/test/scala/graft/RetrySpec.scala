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
