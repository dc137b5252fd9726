package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.{Candles, Retention}
import graft.sources.Tables

/** Cohort retention / rolling engagement / hop candles: brute-force
  * equality on real data plus plan shape (the scalable forms must not
  * re-introduce the fact self-joins they exist to avoid).
  */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def countShuffles(p: SparkPlan): Int =
    p.collect { case _: ShuffleExchangeExec => 1 }.sum

  test("cohortRetention equals the naive join formulation") {
    val ev = Tables.events(spark, sf)
    val got = Retention.cohortRetention(ev, Seq(1, 7))
      .select($"cohort_day".cast("string"), $"n_users", $"d1", $"d7")
      .collect().map(_.toSeq).toSet

    val ud = ev.select($"user_id", to_date($"ts").as("day")).distinct()
    val cohort = ud.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    val want = cohort.join(ud, "user_id")
      .groupBy($"cohort_day")
      .agg(countDistinct($"user_id").as("n_users"),
        countDistinct(when($"day" === date_add($"cohort_day", 1), $"user_id")).as("d1"),
        countDistinct(when($"day" === date_add($"cohort_day", 7), $"user_id")).as("d7"))
      .select($"cohort_day".cast("string"), $"n_users", $"d1", $"d7")
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("cohortRetention plans two shuffles (user grid + cohort rollup), no join") {
    val plan = Retention.cohortRetention(Tables.events(spark, sf), Seq(1, 7))
      .queryExecution.executedPlan
    assert(countShuffles(plan) <= 2, plan.toString)
    assert(!plan.toString.toLowerCase.contains("join"), plan.toString)
  }

  test("rollingDistinctUsers equals the brute-force interval count") {
    val ev = Tables.events(spark, sf)
    val got = Retention.rollingDistinctUsers(ev, 7)
      .select($"day".cast("string"), $"active_users")
      .collect().map(_.toSeq).toSet

    val ud = ev.select($"user_id", to_date($"ts").as("day")).distinct()
    val days = ud.select($"day").distinct().as("d")
    val want = days.join(ud.as("u"),
        col("u.day").between(date_sub(col("d.day"), 6), col("d.day")))
      .groupBy(col("d.day"))
      .agg(countDistinct(col("u.user_id")).as("active_users"))
      .select(col("d.day").cast("string"), $"active_users")
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("rollingDistinctUsers window=1 degenerates to daily active users") {
    val ev = Tables.events(spark, sf)
    val got = Retention.rollingDistinctUsers(ev, 1)
      .select($"day".cast("string"), $"active_users")
      .collect().map(_.toSeq).toSet
    val want = ev.groupBy(to_date($"ts").cast("string").as("day"))
      .agg(countDistinct($"user_id").as("active_users"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("cumulativeUsers equals brute-force users-to-date per day") {
    val ev = Tables.events(spark, sf)
    val got = Retention.cumulativeUsers(ev)
      .select($"day".cast("string"), $"new_users", $"cum_users")
      .collect().map(_.toSeq).toSet

    val ud = ev.select($"user_id", to_date($"ts").as("day")).distinct()
    val days = ud.select($"day").distinct().as("d")
    val cum = days.join(ud.as("u"), col("u.day") <= col("d.day"))
      .groupBy(col("d.day")).agg(countDistinct(col("u.user_id")).as("cum_users"))
    // brute-force new_users = cum - previous cum
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("day"))
    val want = cum
      .withColumn("new_users",
        (col("cum_users") - coalesce(lag(col("cum_users"), 1).over(w), lit(0L))))
      .filter(col("new_users") > 0) // cumulativeUsers emits first-seen days only
      .select(col("day").cast("string"), $"new_users", $"cum_users")
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("hopCandles: every txn lands in exactly width/slide windows") {
    val txn = Candles.transactions(spark, sf)
    val hop = Candles.hopCandles(txn, 600, 300)
    val nTxn = txn.count()
    assert(hop.agg(sum($"n_txn")).as[Long].head() === 2 * nTxn)
    // window bounds really span width and align to the slide grid
    val bad = hop.filter(
      unix_timestamp($"window_end") - unix_timestamp($"window_start") =!= 600 ||
        unix_timestamp($"window_start") % 300 =!= 0).count()
    assert(bad === 0)
  }

  test("hopCandles offset-0 windows agree with tumbling rollupInterval(600)") {
    val txn = Candles.transactions(spark, sf)
    // a 600s-wide hop window starting on the 600s grid contains the
    // same txns as the 600s tumbling candle — OHLCV must be identical
    val hop = Candles.hopCandles(txn, 600, 300)
      .filter(unix_timestamp($"window_start") % 600 === 0)
      .select($"symbol", $"window_start", $"open", $"high", $"low", $"close",
        $"volume", $"n_txn")
      .collect().map(_.toSeq).toSet
    val tumble = Candles.rollupInterval(Candles.minuteCandles(txn), 600)
      .select($"symbol", $"window_start", $"open", $"high", $"low", $"close",
        $"volume", $"n_txn")
      .collect().map(_.toSeq).toSet
    assert(hop === tumble)
    assert(hop.nonEmpty)
  }
}
