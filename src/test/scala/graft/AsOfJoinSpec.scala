package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("backward as-of join: latest right row ≤ left ts, per key, inclusive ties") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:30")),
      (2L, "A", ts("2024-01-01 11:00:00")), // tie with quote at 11:00:00
      (3L, "A", ts("2024-01-01 09:00:00")), // before any quote -> NULL
      (4L, "B", ts("2024-01-01 10:30:00"))
    ).toDF("id", "symbol", "ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 11:00:00"), 110.0),
      ("B", ts("2024-01-01 10:00:00"), 50.0)
    ).toDF("symbol", "ts", "quote")

    val got = AsOfJoin.asofBackward(trades, quotes, Seq("symbol"), "ts")
      .select("id", "asof_quote").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> Some(100.0), 2L -> Some(110.0), 3L -> None, 4L -> Some(50.0)))
  }
}
