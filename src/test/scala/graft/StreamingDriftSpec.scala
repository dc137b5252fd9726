package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** The streaming drift monitor vs the batch screen: the per-dimension
  * sums are additive integers, so the completed streaming state must
  * equal the batch readout BIT-FOR-BIT — across micro-batch cuts,
  * over the hostile input shapes (ragged/NaN/empty/negative-id), and
  * across a query restart from a checkpoint (the state is the
  * monitor's whole value: losing it silently would under-count the
  * baseline cohort).
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))
  }

  test("streamed driftSums across micro-batches == batch embedDrift (ragged/NaN/empty included)") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      (0L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(0.5f, Float.NaN)),
      (5L, Seq(-0.25f, 0.75f, 0.1f)))
    val b2 = Seq(
      (-1L, Seq(2.0f, -4.0f)), // negative odd id: cohort 1 via pmod
      (3L, Seq.empty[Float]),  // empty array: still counted (global n)
      (4L, Seq(0.9f, 0.9f, 0.9f)))

    val input = MemoryStream[(Long, Seq[Float])]
    spark.catalog.dropTempView("sdrift_sink")
    val q = Similarity.driftSums(input.toDF().toDF("vec_id", "embedding"),
        pmod(col("vec_id"), lit(2)))
      .writeStream.format("memory").queryName("sdrift_sink")
      .outputMode("complete").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val streamed = row(Similarity.driftReadout(spark.table("sdrift_sink")))
    val batch = row(Similarity.embedDrift(
      (b1 ++ b2).toDF("vec_id", "embedding"), pmod(col("vec_id"), lit(2))))
    assert(streamed === batch)
    // and the monitor state is dims+1 rows, not corpus-sized
    assert(spark.table("sdrift_sink").count() === 4L) // 3 dims + null-pos
  }

  test("drift state survives a checkpointed restart (resumed run folds only the delta)") {
    val dir = java.nio.file.Files.createTempDirectory("sdrift-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sdrift-ckpt").toString
    val sfEmb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (a, b) = {
      val all = sfEmb.select(col("vec_id"), col("embedding"))
      (all.filter(col("vec_id") < 250), all.filter(col("vec_id") >= 250))
    }
    a.write.parquet(s"$dir/batch_a.parquet")

    def runOnce(sinkName: String): Unit = {
      spark.catalog.dropTempView(sinkName)
      val stream = spark.readStream.schema(a.schema).parquet(s"$dir/*.parquet")
      val q = Similarity.driftSums(stream, pmod(col("vec_id"), lit(2)))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    runOnce("sdrift_ck1")
    b.write.parquet(s"$dir/batch_b.parquet")
    runOnce("sdrift_ck2")

    // the restarted query saw only batch_b as NEW input; equality with
    // the full-corpus batch screen proves the checkpoint restored the
    // batch_a sums instead of silently restarting the baseline
    val resumed = row(Similarity.driftReadout(spark.table("sdrift_ck2")))
    val batch = row(Similarity.embedDrift(
      sfEmb, pmod(col("vec_id"), lit(2))))
    assert(resumed === batch)
  }
}
