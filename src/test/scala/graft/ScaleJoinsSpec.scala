package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleJoins
import graft.sources.Tables

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = li.join(ord, "l_orderkey")
    val salted = ScaleJoins.saltedJoin(li, ord, "l_orderkey", saltFactor = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain.select(salted.columns.map(col): _*)).count() === 0)
  }

  test("bucketed tables join without a shuffle") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf)
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    ScaleJoins.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    ScaleJoins.writeBucketed(ord, "ord_bucketed", "l_orderkey", 4)
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), "l_orderkey")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    // disable auto-broadcast so the shuffle-free-ness comes from the
    // bucket layout, not from a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("AQE skew-join splits the hot partition of a skewed fact-fact join") {
    // SURVEY §5 claims AQE skew-join handles hot keys in fact-fact
    // joins; this locks it: one key holds 300k of 400k rows, thresholds
    // are lowered to fire at test scale, and the executed adaptive plan
    // must show the skewed partition split (isSkewJoin on the SMJ).
    val settings = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = settings.map { case (k, _) => k -> spark.conf.getOption(k) }
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(400000).select(
        when($"id" < 300000, lit(0L)).otherwise(pmod($"id", lit(1000)) + 1).as("key"),
        $"id".cast("double").as("metric"))
      val right = spark.range(1001).select($"id".as("key"), ($"id" * 2).as("dim"))
      val joined = left.join(right, "key")
        .agg(count(lit(1)).as("n"), sum($"metric" + $"dim").as("s"))

      val Array(row) = joined.collect()
      // every left row matches exactly one right row
      assert(row.getLong(0) === 400000L)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"executed adaptive plan shows no skew-join split:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
