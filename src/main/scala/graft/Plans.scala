package graft
import org.apache.spark.sql.SparkSession

/** Dump executed-plan strings for selected queries (PLANS.md source). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
