package graft
import org.apache.spark.sql.SparkSession

/** Print the executed physical plan of named queries (PLANS.md is
  * curated from this output). Usage: runMain graft.PlanDump q1_agg …
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runFirst = sys.env.get("SPARK_GRAFT_FINAL").contains("1")
    args.foreach { name =>
      println(s"\n## $name\n")
      val df = SparkEntry.queries(name)(spark, sf)
      if (runFirst) df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
