package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).select(sum("id")).collect()
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"run$round ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
