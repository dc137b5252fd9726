package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within its error bound vs exact counts") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
    val joined = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", 0.02).as("approx"))
      .collect()
    joined.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact <= 0.1,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
