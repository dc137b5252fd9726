package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Decade measurement for the quantized-ANN family: per corpus size,
  * wall seconds and recall@k vs exact brute force for the binary
  * (sign-bit hamming), int8 and LSH coarse stages at a fixed re-rank
  * budget. The numbers behind the "which quantization tier when"
  * guidance at Similarity.annBinary — measured, not asserted.
  *
  * Usage: runMain graft.AnnBench label=path [label=path ...]
  * (paths are GenData/driver dirs holding embeddings.parquet).
  * Emits one JSON line per (corpus, method).
  */
object AnnBench {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnBench label=path ...")
    val spark = SparkSession.builder()
      .appName("graft-annbench")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val topK = sys.env.getOrElse("SPARK_GRAFT_ANN_TOPK", "10").toInt
    val coarseK = sys.env.getOrElse("SPARK_GRAFT_ANN_COARSEK", "100").toInt
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "20").toInt

    try {
      args.foreach { spec =>
        val Array(label, path) = spec.split("=", 2)
        val emb = spark.read.parquet(s"$path/embeddings.parquet")
          .select(col("vec_id"), col("embedding")).cache()
        val n = emb.count()
        val queries = emb.filter(col("vec_id") < nQueries)

        def timeRun(df: DataFrame): (Double, Array[(Long, Long)]) = {
          val t0 = System.nanoTime()
          val rows = df.select(col("query_id"), col("vec_id"))
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          ((System.nanoTime() - t0) / 1e9, rows)
        }

        // ground truth once (also warms the cache so method timings
        // measure scoring, not the first parquet read)
        val (bruteS, bruteRows) = timeRun(
          Similarity.knnBrute(emb, queries, topK))
        val truth = bruteRows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

        def recallOf(rows: Array[(Long, Long)]): Double = {
          val got = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
          val per = truth.map { case (q, t) =>
            got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0)
          }
          per.sum / per.size
        }

        def emit(method: String, sec: Double, recall: Double): Unit =
          println(f"""{"bench":"ann","corpus":"$label","n_vectors":$n,""" +
            f""""method":"$method","top_k":$topK,"coarse_k":$coarseK,""" +
            f""""sec":$sec%.3f,"recall":$recall%.6f}""")

        emit("brute", bruteS, 1.0)
        val (binS, binRows) = timeRun(
          Similarity.annBinary(emb, queries, topK, coarseK))
        emit("binary", binS, recallOf(binRows))
        val (i8S, i8Rows) = timeRun(
          Similarity.annInt8(emb, queries, topK, coarseK))
        emit("int8", i8S, recallOf(i8Rows))
        val (lshS, lshRows) = timeRun(
          Similarity.annLsh(emb, queries, topK, nBits = 8, probes = 1))
        emit("lsh_probe1", lshS, recallOf(lshRows))
        emb.unpersist()
      }
    } finally spark.stop()
  }
}
