package graft

import org.apache.spark.sql.SparkSession

import graft.operators.LshDedup
import graft.sources.Tables

/** Recall-vs-work curves for the capped similarity miners, on a
  * corpus whose gram df spectrum is a CONTINUUM (GenData's
  * `zipfvocab` variant), not the stock 31-word corpus's binary
  * saturated-or-sparse shape.
  *
  * Why a dedicated main: every recall the oracle gates have measured
  * (q_containment_recall, q_dedup_capped_recall) is 1.0 — honest but
  * weak evidence, because on the stock vocabulary the caps either
  * clamp EVERYTHING (saturated gram space, budget binds on noise) or
  * NOTHING (df-1 tail, no true pair ever capped). This harness runs
  * the same recall reports while the knobs actually bind on true
  * pairs: sweep the containment df cap (maxDf), the containment work
  * budget (maxCandidateBudget), and the simhash bucket cap
  * (maxBucket), printing one JSON line per point — recall, the
  * fired-cap evidence (n_grams_capped / n_slots_dropped), and wall
  * seconds. The exact miner inside each report is the ground truth;
  * capped ⊆ exact by construction, so the ratio is pair recall.
  *
  * Expected shape (the point of the exercise): recall 0 when no
  * shared gram can be keyed (maxDf=1 — any shared gram has df ≥ 2),
  * rising with the cap until it matches the exact answer — a CURVE
  * with sub-1.0 points a knob buys back, replacing "recall 1.0
  * everywhere" with measured degradation.
  *
  * Usage: graft.RecallBench <zipfVocabSfDir>
  */
object RecallBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf1zipf")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-recall-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)

    def emit(family: String, knob: String, value: Long,
             fields: Seq[(String, Long)], secs: Double): Unit =
      println(s"""{"metric":"recall_bench","family":"$family",""" +
        s""""knob":"$knob","value":$value,""" +
        fields.map { case (k, v) => s""""$k":$v""" }.mkString(",") +
        s""","secs":$secs,"sf":"$sfDir"}""")

    // empty string = skip the family; unset = the default sweep
    def knobList(env: String, default: Seq[Long]): Seq[Long] =
      sys.env.get(env)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq)
        .getOrElse(default)

    // containment df-cap sweep: n=5, t=0.5 (the q_containment_scale
    // knobs), percent cap held open so maxDf is the binding knob
    for (maxDf <- knobList("SPARK_GRAFT_RECALL_DFS",
        Seq(1L, 2L, 4L, 8L, 16L, 64L, 1000L))) {
      val t0 = System.nanoTime()
      val r = LshDedup.containmentCappedRecallReport(docs,
        threshold = 0.5, n = 5, maxDf = maxDf).collect()(0)
      emit("containment", "max_df", maxDf,
        Seq("n_docs" -> r.getAs[Long]("n_docs"),
          "n_pairs_exact" -> r.getAs[Long]("n_pairs_exact"),
          "n_pairs_capped" -> r.getAs[Long]("n_pairs_capped"),
          "n_grams_capped" -> r.getAs[Long]("n_grams_capped"),
          "recall_micro" -> r.getAs[Long]("recall_micro")),
        (System.nanoTime() - t0) / 1e9)
    }
    // containment work-budget sweep: df cap held open so the
    // rarest-first budget admission is the binding knob. The
    // interesting region sits where whole df classes flip: below the
    // df-1 class cost nothing is keyed at all; shared grams have
    // df >= 2 by definition, so recall stays 0 until the budget also
    // admits the df-2 class (~cnt1 + 4*cnt2), then jumps to the
    // df<=2 recall
    for (budget <- knobList("SPARK_GRAFT_RECALL_BUDGETS",
        Seq(1000000L, 2000000L, 2600000L, 3000000L, 10000000L,
          500000000L))) {
      val t0 = System.nanoTime()
      val r = LshDedup.containmentCappedRecallReport(docs,
        threshold = 0.5, n = 5, maxDf = Long.MaxValue / 4,
        maxCandidateBudget = budget).collect()(0)
      emit("containment", "budget", budget,
        Seq("n_docs" -> r.getAs[Long]("n_docs"),
          "n_pairs_exact" -> r.getAs[Long]("n_pairs_exact"),
          "n_pairs_capped" -> r.getAs[Long]("n_pairs_capped"),
          "n_grams_capped" -> r.getAs[Long]("n_grams_capped"),
          "recall_micro" -> r.getAs[Long]("recall_micro")),
        (System.nanoTime() - t0) / 1e9)
    }
    // simhash bucket-cap sweep (maxHamming=6, the q_dedup_simhash
    // knob): dropped slots = buckets past the cap
    for (maxBucket <- knobList("SPARK_GRAFT_RECALL_BUCKETS",
        Seq(1L, 2L, 4L, 16L, 2000L)).map(_.toInt)) {
      val t0 = System.nanoTime()
      val r = LshDedup.simhashCappedRecallReport(docs,
        maxHamming = 6, maxBucket = maxBucket).collect()(0)
      val fields = r.schema.fieldNames.filter(_ != "recall_micro")
        .filter(f => r.schema(f).dataType ==
          org.apache.spark.sql.types.LongType)
        .map(f => f -> r.getAs[Long](f)).toSeq :+
        ("recall_micro" -> r.getAs[Long]("recall_micro"))
      emit("simhash", "max_bucket", maxBucket.toLong, fields,
        (System.nanoTime() - t0) / 1e9)
    }
    spark.stop()
  }
}
