package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{EventStore, Tables}

class EventStoreSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned event lake: layout, pruning, range reads") {
    val dir = Files.createTempDirectory("eventstore").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    EventStore.write(events, dir)

    assert(new java.io.File(s"$dir/event_date=2024-01-05").exists())

    val ranged = EventStore.readRange(spark, dir,
      "2024-01-05 00:00:00", "2024-01-08 00:00:00")
    val want = events.filter(
      $"ts" >= to_timestamp(lit("2024-01-05 00:00:00")) &&
      $"ts" < to_timestamp(lit("2024-01-08 00:00:00"))).count()
    assert(ranged.count() === want && want > 0)

    // the date predicate must prune partitions (not scan all days)
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"no partition pruning in:\n$plan")
  }
}
