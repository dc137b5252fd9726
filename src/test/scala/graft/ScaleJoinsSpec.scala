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
}
