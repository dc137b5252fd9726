package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("grain-bucketed interval join equals the naive range join") {
    val events = Seq(
      (1L, "A", ts("2024-01-01 10:15:00")),
      (2L, "A", ts("2024-01-01 11:59:59")),
      (3L, "A", ts("2024-01-01 12:00:00")), // exactly at an interval end: excluded
      (4L, "B", ts("2024-01-01 10:30:00")),
      (5L, "A", ts("2024-01-02 09:00:00"))  // no covering interval
    ).toDF("id", "symbol", "ts")
    val intervals = Seq(
      ("A", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), "s1"),
      ("A", ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00"), "s2"),
      ("B", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "s3")
    ).toDF("symbol", "start", "end", "label")

    for (grain <- Seq(60L, 3600L, 86400L)) {
      val got = RangeJoin.intervalJoin(events, "ts", intervals, "start", "end",
        Seq("symbol"), grain)
        .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((1L, "s1"), (2L, "s1"), (3L, "s2"), (4L, "s3")),
        s"grain=$grain")
    }
  }

  test("interval join has no nested-loop in the plan") {
    val events = Seq((1L, "A", ts("2024-01-01 10:15:00"))).toDF("id", "symbol", "ts")
    val intervals = Seq(("A", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("symbol", "start", "end")
    val plan = RangeJoin.intervalJoin(events, "ts", intervals, "start", "end",
      Seq("symbol"), 3600).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range join fell back to nested loop:\n$plan")
  }
}
