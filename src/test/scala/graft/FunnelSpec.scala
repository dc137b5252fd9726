package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel stages honor strict in-order semantics") {
    val events = Seq(
      // full funnel, in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // click BEFORE the first view: not a conversion; later purchase
      // cannot qualify without a qualifying click
      (2L, "click", ts("2024-01-01 10:00:00")),
      (2L, "view", ts("2024-01-01 10:05:00")),
      (2L, "purchase", ts("2024-01-01 10:10:00")),
      // view then purchase, no click: stops at stage 1
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-01 10:05:00")),
      // purchase only: never enters the funnel
      (4L, "purchase", ts("2024-01-01 10:00:00")),
      // click at the SAME timestamp as the view: strict order fails
      (5L, "view", ts("2024-01-01 10:00:00")),
      (5L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")

    val stages = Funnel.userStages(events).collect()
      .map(r => r.getLong(0) -> (r.get(1) != null, r.get(2) != null, r.get(3) != null))
      .toMap
    assert(stages(1L) === ((true, true, true)))
    assert(stages(2L) === ((true, false, false)))
    assert(stages(3L) === ((true, false, false)))
    assert(stages(4L) === ((false, false, false)))
    assert(stages(5L) === ((true, false, false)))

    val rep = Funnel.report(events).collect()
    assert(rep.length === 1)
    val r = rep.head
    assert(r.getString(0) === "2024-01-01")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 1L, 1L)))
  }

  test("stage timestamps are invariant under event order and partitioning") {
    // the funnel reads event ORDER from ts, so shuffling the input
    // rows (and the partition layout) must not change any stage
    val events = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      (2L, "click", ts("2024-01-02 09:00:00")),
      (2L, "view", ts("2024-01-02 09:30:00")),
      (2L, "click", ts("2024-01-02 09:45:00")),
      (2L, "purchase", ts("2024-01-02 10:00:00")),
      (3L, "view", ts("2024-01-03 08:00:00")))
    def run(rows: Seq[(Long, String, java.sql.Timestamp)], parts: Int) =
      Funnel.userStages(rows.toDF("user_id", "event_type", "ts").repartition(parts))
        .collect()
        .map(r => r.getLong(0) -> (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3)))
        .toMap
    val base = run(events, 1)
    assert(base(2L)._2 === ts("2024-01-02 09:45:00")) // post-view click wins
    for (seed <- Seq(7, 13); parts <- Seq(2, 5)) {
      val shuffled = new scala.util.Random(seed).shuffle(events)
      assert(run(shuffled, parts) === base, s"seed=$seed parts=$parts")
    }
  }

  test("a second qualifying click later in the stream still converts") {
    val events = Seq(
      (7L, "click", ts("2024-01-01 09:00:00")), // pre-view click: ignored
      (7L, "view", ts("2024-01-01 10:00:00")),
      (7L, "click", ts("2024-01-01 11:00:00")), // this one qualifies
      (7L, "purchase", ts("2024-01-01 12:00:00")))
      .toDF("user_id", "event_type", "ts")
    val r = Funnel.userStages(events).collect().head
    assert(r.getTimestamp(1) === ts("2024-01-01 10:00:00"))
    assert(r.getTimestamp(2) === ts("2024-01-01 11:00:00"))
    assert(r.getTimestamp(3) === ts("2024-01-01 12:00:00"))
  }
}
