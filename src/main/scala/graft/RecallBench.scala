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

    def recallMicro(capped: Long, exact: Long): Long =
      if (exact == 0L) 1000000L
      else math.floor(capped.toDouble / exact.toDouble * 1e6).toLong

    // SPARK_GRAFT_RECALL_COHORT_MOD=k switches the containment family
    // to SAMPLED-COHORT ground truth, the only sound shape at corpus
    // sizes where the exact miner self-refuses (500k docs): the exact
    // miner runs on the id % k == 0 cohort alone (containment is a
    // pairwise property — a cohort pair's truth does not depend on
    // the rest of the corpus), while the CAPPED miner runs on the
    // FULL corpus (its df caps and work budget are corpus-relative —
    // that is exactly what changes with scale) and its output is
    // restricted to cohort×cohort pairs. Soundness: the capped miner
    // verifies with the exact containment filter, so every emitted
    // cohort pair is a true pair ⇒ restricted-capped ⊆ exact-cohort
    // and the count ratio is the production config's pair recall
    // measured on the cohort.
    val cohortMod = sys.env.get("SPARK_GRAFT_RECALL_COHORT_MOD").map(_.toLong)
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // one shared cohort predicate — three sites (exact docs, pair
    // restriction, survivor restriction) must never diverge
    def inCohort(df: org.apache.spark.sql.DataFrame,
                 idCols: String*): org.apache.spark.sql.DataFrame =
      cohortMod match {
        case Some(k) => df.filter(
          idCols.map(c => pmod(col(c), lit(k)) === 0L).reduce(_ && _))
        case None => df
      }
    def restrictToCohort(pairs: org.apache.spark.sql.DataFrame) =
      inCohort(pairs, "doc_a", "doc_b")

    // The exact ground-truth miner is knob-INVARIANT (it depends only
    // on docs/threshold/n), so each family computes its denominator
    // ONCE and the sweep re-runs only the capped side — the per-point
    // numbers equal the one-shot *CappedRecallReport by construction
    // (capped ⊆ exact; recall is the count ratio both compute).
    // LAZY: the miner is the bench's most expensive computation (and
    // ExactScale-guarded at corpus sizes), so it must not run when
    // both containment sweep lists are empty ("empty string = skip
    // the family").
    val nDocs = docs.count()

    // containment: n=5, t=0.5 (the q_containment_scale knobs)
    lazy val exactContainment = LshDedup.containmentPairs(
      inCohort(docs, "doc_id"), threshold = 0.5, n = 5).count()
    def containmentPoint(knob: String, value: Long, maxDf: Long,
                         budget: Long): Unit = {
      val t0 = System.nanoTime()
      val capped = restrictToCohort(LshDedup.containmentPairsCapped(docs,
        threshold = 0.5, n = 5, maxDf = maxDf,
        maxDfPercent = 100, maxCandidateBudget = budget)).count()
      val gramsCapped = LshDedup.containmentDropStats(docs, n = 5,
          maxDf = maxDf, maxDfPercent = 100, maxCandidateBudget = budget)
        .select("n_grams_capped").collect()(0).getLong(0)
      emit("containment", knob, value,
        Seq("n_docs" -> nDocs,
          "cohort_mod" -> cohortMod.getOrElse(1L),
          "n_pairs_exact" -> exactContainment,
          "n_pairs_capped" -> capped,
          "n_grams_capped" -> gramsCapped,
          "recall_micro" -> recallMicro(capped, exactContainment)),
        (System.nanoTime() - t0) / 1e9)
    }
    // df-cap sweep: percent cap held open so maxDf is the binding knob
    for (maxDf <- knobList("SPARK_GRAFT_RECALL_DFS",
        Seq(1L, 2L, 4L, 8L, 16L, 64L, 1000L)))
      containmentPoint("max_df", maxDf, maxDf, 500000000L)
    // work-budget sweep: df cap held open so the rarest-first budget
    // admission is the binding knob. The interesting region sits
    // where whole df classes flip: below the df-1 class cost nothing
    // is keyed at all; shared grams have df >= 2 by definition, so
    // recall stays 0 until the budget also admits the df-2 class
    // (~cnt1 + 4*cnt2), then jumps to the df<=2 recall
    for (budget <- knobList("SPARK_GRAFT_RECALL_BUDGETS",
        Seq(1000000L, 2000000L, 2600000L, 3000000L, 10000000L,
          500000000L)))
      containmentPoint("budget", budget, Long.MaxValue / 4, budget)

    // minhash band path: does ITS skew cap (default 1000) bind at
    // this corpus size? The simhash envelope finding recommends the
    // band path at 500k+ BECAUSE its cap should be a spam guard, not
    // a recall knob — this point measures that claim instead of
    // asserting it: dropStats says whether any bucket exceeded the
    // cap, and when one did, capped-vs-near-uncapped candidate counts
    // (cohort-restricted) give the candidate-recall impact.
    {
      val t0 = System.nanoTime()
      val DefaultCap = 1000 // minhashCandidates' default maxBucket
      val WideCap = 100000
      val drop = LshDedup.dropStats(docs, maxBucket = DefaultCap).collect()(0)
      val nb = drop.getAs[Long]("n_buckets_dropped")
      val ns = drop.getAs[Long]("n_doc_slots_dropped")
      val cappedMh = restrictToCohort(
        LshDedup.minhashCandidates(docs, maxBucket = DefaultCap)).count()
      // the "uncapped" denominator is itself bounded at WideCap — the
      // no-silent-caps rule demands the residual drop be OBSERVED, so
      // a bucket past even the wide bound surfaces as a non-zero
      // n_buckets_dropped_wide (recall_micro is then a lower bound on
      // the impact, visibly, not silently)
      val (uncappedMh, nbWide) =
        if (nb == 0L) (cappedMh, 0L)
        else (restrictToCohort(
            LshDedup.minhashCandidates(docs, maxBucket = WideCap)).count(),
          LshDedup.dropStats(docs, maxBucket = WideCap).collect()(0)
            .getAs[Long]("n_buckets_dropped"))
      // field names mark these as CANDIDATE-level (pre-verification)
      // counts and a candidate-level recall LOWER BOUND over the
      // WideCap-bounded denominator — NOT the verified-pair recall the
      // containment/simhash families emit; consumers aggregating
      // recall_bench lines across families must not mix the two
      emit("minhash", "max_bucket", DefaultCap.toLong,
        Seq("n_docs" -> nDocs,
          "cohort_mod" -> cohortMod.getOrElse(1L),
          "n_buckets_dropped" -> nb,
          "n_doc_slots_dropped" -> ns,
          "n_buckets_dropped_wide" -> nbWide,
          "n_cands_capped" -> cappedMh,
          "n_cands_wide" -> uncappedMh,
          "candidate_recall_lb_micro" -> recallMicro(cappedMh, uncappedMh)),
        (System.nanoTime() - t0) / 1e9)
    }

    // simhash bucket-cap sweep (maxHamming=6, the q_dedup_simhash
    // knob): exact side + survivors + bit order computed once, the
    // sweep re-buckets the persisted survivors only.
    //
    // Cohort mode is sound here too, with one care point: the
    // exact-dedup SURVIVOR step is corpus-dependent (a cohort doc's
    // survival depends on out-of-cohort duplicate twins), so the
    // survivor set is computed on the FULL corpus — that pass is
    // linear and feasible at any size — and the cohort ground truth
    // is the exact miner over cohort ∩ survivors (hamming is
    // pairwise, so a cohort pair's truth is corpus-independent; the
    // bit ORDER is corpus-derived but ANY disjoint chunk partition
    // preserves the pigeonhole completeness, so sharing the full-
    // corpus order changes nothing). The capped miner runs on the
    // full survivor set — its bucket sizes are what scale changes —
    // and its output, hamming-verified, restricted to cohort pairs
    // is ⊆ the cohort exact pairs.
    // pre-round-12 the sweep went down to maxBucket=1 — meaningful
    // when tiny caps DROPPED buckets (recall knob), degenerate now
    // that recursion converts them into bounded-but-pointless split
    // work (the WorkFactor guard stops them). 16 exercises that
    // guard observably; 2000-8000 is the production recall/memory
    // region (8000 OOM'd the pre-chunked emission — the round-12
    // memory fix's measured point)
    // SPARK_GRAFT_RECALL_DEFAULT_ONLY=1 empties both sweeps up front
    // (see below) so only the DEFAULT point runs
    val defaultOnly =
      sys.env.get("SPARK_GRAFT_RECALL_DEFAULT_ONLY").contains("1")
    val bucketSweep =
      if (defaultOnly) Nil
      else knobList("SPARK_GRAFT_RECALL_BUCKETS",
        Seq(16L, 2000L, 4000L, 8000L)).map(_.toInt)
    // recursion-depth sweep at the default cap, WITHOUT the dense-
    // core enumerator (maxEnum=0): depth 1 = the round-7 one-level
    // guard, depth 2 = the round-10/11 complement split (whose
    // DEFAULT measured 0.578 recall at 500k Zipf docs —
    // RECALL_COHORT_r11), deeper = the refuted pure-recursion path
    // (measured: depth 24 == depth 2 at 500k — dense cores multiply
    // instead of fragmenting). The DEFAULT point (depth 6 + the
    // 20k-signature exact enumerator) is what gates verdict-r11 #1:
    // the DEFAULT path's recall at 500k docs
    val depthSweep =
      if (defaultOnly) Nil
      else knobList("SPARK_GRAFT_RECALL_DEPTHS",
        Seq(1L, 2L, 6L)).map(_.toInt)
    // DEFAULT_ONLY runs the DEFAULT simhash point alone (no sweeps) —
    // the 5M-decade shape, where a single default measurement is
    // hours-scale and re-running it 4-8 times under sweep knobs would
    // be waste, not signal
    if (!defaultOnly && bucketSweep.isEmpty && depthSweep.isEmpty) {
      spark.stop(); return
    }
    val surv = graft.operators.Dedup.dropExactDuplicates(docs)
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSurv = surv.count()
    val bitOrder = Some(LshDedup.simhashBitOrder(surv))
    lazy val exactSimhash = LshDedup.simhashCandidates(inCohort(surv, "doc_id"),
      maxHamming = 6, bitOrder).count()
    def simhashPoint(knob: String, value: Long, maxBucket: Int,
                     maxDepth: Int, maxEnum: Int): Unit = {
      val t0 = System.nanoTime()
      val capped = restrictToCohort(LshDedup.simhashCandidatesCapped(surv,
        maxHamming = 6, maxBucket = maxBucket, bitOrder,
        maxDepth = maxDepth, maxEnum = maxEnum)).count()
      emit("simhash", knob, value,
        Seq("n_docs" -> nDocs,
          "cohort_mod" -> cohortMod.getOrElse(1L),
          "n_survivors" -> nSurv,
          "max_bucket" -> maxBucket.toLong,
          "max_depth" -> maxDepth.toLong,
          "max_enum" -> maxEnum.toLong,
          "n_pairs_exact" -> exactSimhash,
          "n_pairs_capped" -> capped,
          "recall_micro" -> recallMicro(capped, exactSimhash)),
        (System.nanoTime() - t0) / 1e9)
    }
    for (maxBucket <- bucketSweep)
      simhashPoint("max_bucket", maxBucket.toLong, maxBucket, 6, 20000)
    for (maxDepth <- depthSweep)
      simhashPoint("depth", maxDepth.toLong, 2000, maxDepth, 0)
    // SPARK_GRAFT_RECALL_DROPSTATS=1: emit the default knobs' drop
    // stats FIRST (recursion-only cost, no pair mining) — at decade
    // scales this answers "does any terminal core pass maxEnum?"
    // even if the full default mining run must be cut off
    if (sys.env.get("SPARK_GRAFT_RECALL_DROPSTATS").contains("1")) {
      val t0 = System.nanoTime()
      val ds = LshDedup.simhashDropStats(surv, maxHamming = 6,
        maxBucket = 2000, bitOrder, maxDepth = 6, maxEnum = 20000).head()
      emit("simhash", "default_dropstats", 0L,
        Seq("n_docs" -> nDocs, "n_survivors" -> nSurv,
          "n_buckets_dropped" -> ds.getAs[Long]("n_buckets_dropped"),
          "n_sig_slots_dropped" -> ds.getAs[Long]("n_sig_slots_dropped"),
          "n_cliques_dropped" -> ds.getAs[Long]("n_cliques_dropped"),
          "n_clique_pairs_dropped" ->
            ds.getAs[Long]("n_clique_pairs_dropped")),
        (System.nanoTime() - t0) / 1e9)
    }
    // the DEFAULT path — every knob at its default
    simhashPoint("default", 0L, 2000, 6, 20000)
    surv.unpersist()
    spark.stop()
  }
}
