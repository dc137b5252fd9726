package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness: time one query (arg 0, default the
  * current tuning target) for three rounds at sf0.1 — JIT-warm
  * steady-state numbers, the same measurement Bench takes per query.
  * Arg 0 may be a comma-separated list: every named query runs its
  * three rounds in ONE warm JVM (cheap way to collect warm floors
  * for a batch of tuning targets).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_quality_filter")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).select(sum("id")).collect()
    names.foreach { name =>
    if (names.size > 1) println(s"== $name")
    // stage-split targets (prefix "_"): isolate one phase of a
    // composite query so regressions attribute to the right stage
    val target: (SparkSession, String) => DataFrame = name match {
      case "_cluster_pairs" => (s, d) =>
        graft.operators.LshDedup.exactJaccardPairs(
          graft.sources.Tables.documents(s, d), threshold = 0.8)
          .select(col("doc_a"), col("doc_b"))
      case "_cluster_cc" =>
        // pairs pre-materialized ONCE (outside the timed rounds) so
        // only CC is on the clock
        val p = graft.operators.LshDedup.exactJaccardPairs(
          graft.sources.Tables.documents(spark, sf), threshold = 0.8)
          .select(col("doc_a"), col("doc_b")).localCheckpoint()
        (_, _) => graft.operators.Dedup.connectedComponents(p)
      case "_cc_rounds" =>
        // per-round attribution of the star loop: checkpoint vs
        // convergence-check cost and edge counts per round (r16 —
        // the VERDICT-r15 "round/checkpoint attribution" probe)
        val p = graft.operators.LshDedup.exactJaccardPairs(
          graft.sources.Tables.documents(spark, sf), threshold = 0.8)
          .select(col("doc_a"), col("doc_b")).localCheckpoint()
        (_, _) => {
          var edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
            .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
          var prev = edges.count()
          var converged = false
          var iter = 0
          while (!converged && iter < 50) {
            val t0 = System.nanoTime()
            val next = graft.operators.Dedup.smallStar(
              graft.operators.Dedup.largeStarRaw(edges)).localCheckpoint()
            val t1 = System.nanoTime()
            val nc = next.count()
            val t2 = System.nanoTime()
            converged = nc == prev &&
              next.join(edges, Seq("src", "dst"), "left_anti")
                .limit(1).count() == 0
            val t3 = System.nanoTime()
            println(f"  cc round $iter%d ckpt=${(t1 - t0) / 1e9}%5.2f" +
              f" count=${(t2 - t1) / 1e9}%5.2f anti=${(t3 - t2) / 1e9}%5.2f" +
              f" edges $prev%d -> $nc%d")
            edges = next; prev = nc; iter += 1
          }
          edges.groupBy(col("src").as("doc_id"))
            .agg(min(col("dst")).as("cluster_id"))
        }
      case "_pipeline_tiers" => (s, d) => {
        // per-tier wall for the staged funnel: onTierWritten fires at
        // each tier's commit, so consecutive deltas attribute the
        // run's cost to stages (the q_pipeline_full creep forensics)
        val t0 = System.nanoTime()
        val lastRef = new java.util.concurrent.atomic.AtomicLong(t0)
        graft.operators.Curation.fullPipelineStaged(
          graft.sources.Tables.documents(s, d),
          java.nio.file.Files.createTempDirectory("graft_prof_tiers")
            .toString,
          onTierWritten = name => {
            val now = System.nanoTime()
            val last = lastRef.getAndSet(now)
            println(f"  tier $name%-16s +${(now - last) / 1e9}%6.2f s" +
              f"  (cum ${(now - t0) / 1e9}%6.2f)")
          })
      }
      case "_so_struct" => (s, d) => {
        val toks = graft.operators.TextAnalysis.tokens(col("text"))
        val len = size(col("t")) - 2
        graft.sources.Tables.documents(s, d)
          .select(col("source"), toks.as("t"))
          .filter(size(col("t")) >= 3)
          .select(col("source"), explode(arrays_zip(
            slice(col("t"), lit(1), len), slice(col("t"), lit(2), len),
            slice(col("t"), lit(3), len))).as("g"))
          .groupBy(col("g")).agg(collect_set(col("source")).as("srcs"))
      }
      case "_so_explode" => (s, d) =>
        graft.sources.Tables.documents(s, d)
          .select(col("source"),
            explode(graft.operators.Dedup.shingles(col("text"), 3)).as("gram"))
          .groupBy(lit(1)).agg(count(lit(1)))
      case "_so_countby" => (s, d) =>
        graft.sources.Tables.documents(s, d)
          .select(col("source"),
            explode(graft.operators.Dedup.shingles(col("text"), 3)).as("gram"))
          .groupBy(col("gram")).agg(count(lit(1)))
      case "_so_setby" => (s, d) =>
        graft.sources.Tables.documents(s, d)
          .select(col("source"),
            explode(graft.operators.Dedup.shingles(col("text"), 3)).as("gram"))
          .groupBy(col("gram")).agg(collect_set(col("source")))
      case "_so_bygram" => (s, d) =>
        // q_source_overlap stage 1: the per-gram source-set aggregate
        graft.sources.Tables.documents(s, d)
          .select(col("source"),
            explode(graft.operators.Dedup.shingles(col("text"), 3)).as("gram"))
          .groupBy(col("gram"))
          .agg(array_sort(collect_set(col("source"))).as("srcs"))
      case n => SparkEntry.queries(n)
    }
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      target(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"run$round ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    }
    spark.stop()
  }
}
