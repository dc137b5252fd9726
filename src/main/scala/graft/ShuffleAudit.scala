package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType, StructType}

/** Plan-quality sweep: flag every query whose physical plan shuffles
  * WIDE payload columns (arrays, binary, long strings) through a
  * ShuffleExchange — the anti-pattern the round-13 annLsh fix
  * removed (embedding pairs riding a dedup shuffle: 89 s → 4.4 s).
  * At 100 TB a shuffle's cost is its bytes; a plan that exchanges
  * text/embedding/media columns where ids + scalars would do is a
  * bottleneck regardless of how green its oracle is.
  *
  * Heuristic, not a gate: some operators MUST shuffle wide columns
  * (a repartition before a per-partition decode; a join whose output
  * is the payload). The sweep prints (query, exchange output schema)
  * for human adjudication; NOTES records the verdicts.
  *
  * Usage: runMain graft.ShuffleAudit [queryName ...] (default: all).
  */
object ShuffleAudit {

  private def isWide(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: BinaryType => true
    case _: StructType => true // struct payloads (profiles, buffers)
    case _ => false
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off: an unexecuted AdaptiveSparkPlanExec hides its
      // subtree from collect(), so the audit would see zero
      // exchanges anywhere (output invariance under this knob is
      // separately gated — PLANSHAPE)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    var flagged = 0
    names.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan
        val hits = plan.collect {
          case e: ShuffleExchangeExec
              if e.output.exists(a => isWide(a.dataType)) =>
            val wide = e.output.filter(a => isWide(a.dataType))
              .map(a => s"${a.name}:${a.dataType.simpleString}")
            s"  exchange[${e.outputPartitioning}] wide=${wide.mkString(",")}"
        }
        // StringType: only flag when a known payload column name rides
        val strHits = plan.collect {
          case e: ShuffleExchangeExec
              if e.output.exists(a => a.dataType == StringType &&
                Seq("text", "body", "payload", "line", "chunk")
                  .exists(a.name.toLowerCase.startsWith)) =>
            val wide = e.output.filter(_.dataType == StringType)
              .map(_.name)
            s"  exchange[${e.outputPartitioning}] text=${wide.mkString(",")}"
        }
        val all = hits ++ strHits
        if (all.nonEmpty) {
          flagged += 1
          println(s"FLAG $name")
          all.foreach(println)
        }
      } catch {
        case e: Exception => println(s"SKIP $name: ${e.getMessage.take(80)}")
      }
    }
    println(s"== flagged $flagged of ${names.size} ==")
    spark.stop()
  }
}
