package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Uniform-vs-skew A/B for the keyed shuffles — measures what the
  * injected-toy skew lock (ScaleJoinsSpec) cannot: real AQE behavior
  * when a generated corpus carries Zipf hot keys (GenData's `skew`
  * mode: one user takes ~7% of all events, one symbol ~39% of all
  * transactions, one order key ~4% of 6M lineitems).
  *
  * Runs a fixed set of keyed queries on ONE sfDir (point it at the
  * uniform and the skewed set in two invocations), two timed runs
  * each keeping the min (Bench's convention), and — the part a timer
  * can't show — reports whether the EXECUTED adaptive plan carries a
  * `skew=true` sort-merge join split, i.e. whether AQE actually
  * rebalanced the hot partition rather than one straggler task
  * eating it.
  *
  * Output: one JSON line
  *   {"sf":dir,"queries":{name:{"sec":s,"skew_join":bool}}}
  */
object SkewBench {
  /** Keyed on the columns GenData skews: symbol/event_type (candle
    * family), user_id (funnel/session/retention), l_orderkey /
    * l_suppkey / o_custkey joins, documents.source rollups, plus the
    * minhash band shuffle whose buckets inherit document skew.
    */
  val Keys: Seq[String] = Seq(
    "q_candle_minute", "q_candle_day", "q_movers",
    "q_sessionize", "q_funnel", "q_retention",
    "q3_join", "q_top_supplier", "q_supplier_profit", "q_custdist",
    "q_dup_rate", "q_corpus_mix", "q_dedup_minhash")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // local[32] partitions are small; drop the skew-split floor so
      // AQE's skewedPartitionFactor logic is exercised at test scale
      // (cluster deployments keep the 256m default)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESHOLD", "8m"))
      // scan-split size; unset ⇒ Spark default (see Bench)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "128m"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_SIZE", "4m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the noop write runs its OWN QueryExecution (the DataFrame's is
    // never executed, so its adaptive plan stays isFinalPlan=false) —
    // capture the FINALIZED plan of each completed action through a
    // QueryExecutionListener instead
    // listener delivery is ASYNC, and queries that run intermediate
    // actions (e.g. the simhash ones-rate stats scan) fire onSuccess
    // for those too — a single last-plan slot could hold a stale or
    // intermediate plan. Collect EVERY plan delivered since the reset
    // and OR the skew check over them; the timed action's plan is
    // guaranteed to be among them once the buffer is non-empty after
    // the action returns.
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          plans.add(qe.executedPlan.toString)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    spark.range(0, 2000000).selectExpr("sum(id)", "avg(id)").collect()

    // wait for the post-action plan deliveries to drain: non-empty
    // AND size stable for a settle window (≤ deadline). Then any
    // skew=true across the delivered set counts — an intermediate
    // action's plan can no longer mask or stand in for the final one.
    def drainPlans(): Seq[String] = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var last = -1
      var stableSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
             (plans.size() == 0 ||
              System.nanoTime() - stableSince < 500L * 1000 * 1000)) {
        if (plans.size() != last) { last = plans.size(); stableSince = System.nanoTime() }
        Thread.sleep(20)
      }
      import scala.jdk.CollectionConverters._
      plans.synchronized(plans.asScala.toList)
    }
    val results = Keys.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Double, Boolean) = {
        // drain the async listener bus BEFORE the reset: a delivery
        // from the PREVIOUS query stalled past its settle window
        // would otherwise land after clear() and be attributed to
        // THIS query's skew verdict
        org.apache.spark.graft.BusFlush.drain(spark.sparkContext)
        plans.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, drainPlans().exists(_.contains("skew=true")))
      }
      val (a, sk1) = once()
      val (b, sk2) = once()
      name -> (math.min(a, b), sk1 || sk2)
    }
    // AQE skew-split demonstration. Two layout facts local testing
    // hides: (1) AQE can only split a skewed reduce partition along
    // MAP-OUTPUT boundaries, and (2) a single-file parquet with ONE
    // row group is ONE map task — on that layout the split can never
    // fire no matter how skewed the key (measured at sf1skew2: a
    // 13.2 MB whale partition vs 291 KB median was declared
    // unsplittable; an explicit repartition(32) made it split).
    // GenData.writeSingle now caps row groups at 8 MiB precisely so
    // the stock testdata is scan-splittable like a production
    // multi-file table — the NATURAL join below must split the whale
    // (skew=true in the final plan) with no repartition workaround.
    // Scale lesson: shard table files (Corpus.shardPlan exists for
    // exactly this) or AQE's skew insurance silently lapses.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1m")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "1m")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    plans.clear()
    val t0 = System.nanoTime()
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_extendedprice").as("rev"))
      .write.format("noop").mode("overwrite").save()
    val demoSec = (System.nanoTime() - t0) / 1e9
    val demo = "{\"sec\":" + f"$demoSec%.2f" +
      ",\"skew_join\":" + drainPlans().exists(_.contains("skew=true")) + "}"

    val qs = results.map { case (k, (s, sk)) =>
      "\"" + k + "\":{\"sec\":" + f"$s%.2f" + ",\"skew_join\":" + sk + "}"
    }.mkString("{", ",", "}")
    println(s"""{"sf":"$sfDir","queries":$qs,"skew_split_demo":$demo}""")
    spark.stop()
  }
}
