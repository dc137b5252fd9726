package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B timing harness for the exact set-similarity join variants
  * (`LshDedup.exactJaccardPairsCounted` vs `...Prefix`), the miner
  * behind q_ngram_jaccard (t=0.2) and the q_dedup_cluster family
  * (t=0.8). Both paths are exact and spec-locked equal (LshSpec
  * "prefix-filtered == count-based at every threshold"); this main
  * measures which one to DEFAULT to per threshold, on the same data
  * layout in the same process — so the choice is evidence, not the
  * scaladoc's sf0.1 extrapolation. Same discipline as graft.Bench:
  * min-of-two, noop sink (full materialization), per-run watchdog.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_TIMEOUT_S,
  * SPARK_GRAFT_MAX_PART_BYTES (8m for big-SF local sweeps),
  * SPARK_GRAFT_ONLY (variant filter). Prints one JSON line.
  */
object JaccardBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "128m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 2000000).selectExpr("sum(id)", "avg(id)").collect()

    import graft.operators.LshDedup
    import graft.sources.Tables
    val variants: Seq[(String, SparkSession => DataFrame)] = Seq(
      "counted_t02" -> ((s: SparkSession) =>
        LshDedup.exactJaccardPairsCounted(Tables.documents(s, sfDir), 0.2)),
      "prefix_t02" -> ((s: SparkSession) =>
        LshDedup.exactJaccardPairsPrefix(Tables.documents(s, sfDir), 0.2)),
      "counted_t08" -> ((s: SparkSession) =>
        LshDedup.exactJaccardPairsCounted(Tables.documents(s, sfDir), 0.8)),
      "prefix_t08" -> ((s: SparkSession) =>
        LshDedup.exactJaccardPairsPrefix(Tables.documents(s, sfDir), 0.8)))

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val timeoutS = sys.env.getOrElse("SPARK_GRAFT_TIMEOUT_S", "900").toLong
    def once(name: String, fn: SparkSession => DataFrame): Double = {
      val t0 = System.nanoTime()
      val group = s"jbench-$name"
      val run = Future {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        try fn(spark).write.format("noop").mode("overwrite").save()
        finally spark.sparkContext.clearJobGroup()
      }
      try {
        Await.result(run, timeoutS.seconds)
        (System.nanoTime() - t0) / 1e9
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          System.err.println(s"[jbench] $name timed out after ${timeoutS}s")
          -1.0
        case e: Throwable =>
          System.err.println(s"[jbench] $name failed: ${e.getMessage}")
          -1.0
      }
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = variants
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val a = once(name, fn)
        val b = if (a < 0) a else once(name, fn)
        name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
      }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"jaccard_ab","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
