package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** Ranks must be BIT-EQUAL to the single-partition window forms it
  * replaces — the whole point is identical results with every window
  * partitioned.
  */
class RanksSpec extends SparkSpec {

  import spark.implicits._

  test("prefixSum equals the global running total (inclusive and strict)") {
    val days = (0 until 200).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong * 3)),
        (i * 37 % 11 - 5).toLong)
    }.toDF("day", "v")
    val expected = days
      .withColumn("run", sum($"v").over(
        Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("carry", coalesce(sum($"v").over(
        Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"day", $"run", $"carry").collect().map(r =>
        (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet

    val incl = Ranks.prefixSum(days, "day", "v",
      date_trunc("month", $"day"), "run")
    val strict = Ranks.prefixSum(days, "day", "v",
      date_trunc("month", $"day"), "carry", strict = true)
    val got = incl.join(strict.select($"day", $"carry"), "day")
      .select($"day", $"run", $"carry").collect().map(r =>
        (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("ntileExact equals ntile(k) over (order by v desc, id) — incl. ties and n < k") {
    for ((n, k) <- Seq((523, 10), (7, 10), (40, 7), (1, 4))) {
      val rows = (0 until n).map(i => (s"u$i", (i * 31 % 17).toDouble)).toDF("id", "v")
      val expected = rows
        .withColumn("t", ntile(k).over(Window.orderBy($"v".desc, $"id")).cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      val got = Ranks.ntileExact(rows, k, "v", "id", out = "t")
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      assert(got === expected, s"mismatch at n=$n k=$k")
    }
  }

  test("ntileExact matches the window form on NULL values (nulls rank last)") {
    val rows = (0 until 97).map { i =>
      (s"u$i", if (i % 7 == 0) None else Some((i * 13 % 23).toDouble))
    }.toDF("id", "v")
    val expected = rows
      .withColumn("t", ntile(5).over(Window.orderBy($"v".desc, $"id")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val got = Ranks.ntileExact(rows, 5, "v", "id", out = "t")
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("withGlobalAgg appends the one-row global and preserves row count") {
    val df = (1 to 100).map(i => (i, i.toLong)).toDF("id", "v")
    val out = Ranks.withGlobalAgg(df,
      Seq(sum($"v").as("total"), count(lit(1)).as("n")))
    val rows = out.collect()
    assert(rows.length === 100)
    assert(rows.forall(r => r.getAs[Long]("total") == 5050L && r.getAs[Long]("n") == 100L))
  }
}
