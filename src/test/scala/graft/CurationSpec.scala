package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Curation}
import graft.sources.Tables

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)

  test("piiRedact replaces emails/phones/ids with typed placeholders and counts them") {
    val d = Seq(
      (1L, "mail me at jo.doe+x@ex-ample.org or admin@site.io thanks"),
      (2L, "call 555-123-4567 and 030-555-1234 ref 123456789"),
      (3L, "clean text with short 123 and word99 untouched"))
      .toDF("doc_id", "text")
    val r = Curation.piiRedact(d).orderBy("doc_id")
      .select("n_emails", "n_phones", "n_ids", "redacted")
      .collect()
    assert(r(0).getInt(0) === 2 && r(0).getString(3) ===
      "mail me at <EMAIL> or <EMAIL> thanks")
    assert(r(1).getInt(1) === 2 && r(1).getInt(2) === 1 &&
      r(1).getString(3) === "call <PHONE> and <PHONE> ref <ID>")
    assert(r(2) === org.apache.spark.sql.Row(0, 0, 0,
      "clean text with short 123 and word99 untouched"))
  }

  test("dsirCountTable (bucket_counts kernel) equals the explode+groupBy reference") {
    // pins the r16 per-row histogram rewrite to the pre-r16 shape:
    // explode one row per token hash, pmod, groupBy count
    val d = docs.withColumn("is_t", col("source") === "src0")
    val got = Curation.dsirCountTable(d, col("is_t"))
    val want = d
      .select(col("doc_id"), col("is_t").as("is_t2"),
        explode(graft.functions.token_fnv_hashes(lower(trim(col("text"))))).as("h"))
      .select(col("doc_id"), col("is_t2"), pmod(col("h"), lit(256L)).as("b"))
      .groupBy(col("doc_id"), col("is_t2"), col("b"))
      .agg(count(lit(1)).as("n"))
      .select(col("doc_id"), col("is_t2").as("is_t"), col("b"), col("n"))
    assert(got.schema.map(f => (f.name, f.dataType)) ===
      want.schema.map(f => (f.name, f.dataType)))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("dsirWeights ranks target-like raw docs above unlike ones, integer-exact") {
    // target slice speaks "zebra quark"-ish vocabulary; raw doc 10
    // shares it, raw doc 11 is disjoint — importance weighting must
    // order 10 above 11, exclude the target docs, and produce an
    // INTEGER weight that is invariant to partitioning (the summation
    // order no engine pins)
    val target = (0L until 5L).map(i => (i, "zebra quark boson lepton gluon", true))
    val raw = Seq(
      (10L, "zebra quark boson photon", false),
      (11L, "apple banana cherry melon grape", false))
    val d = (target ++ raw).toDF("doc_id", "text", "is_t")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.dsirWeights(df, isTarget = col("is_t"))
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val got = run(d)
    assert(got.map(_._1) === List(10L, 11L)) // raw pool only
    assert(got(0)._2 === 4L && got(1)._2 === 5L) // token counts
    assert(got(0)._3 > got(1)._3) // target-like ranks above unlike
    assert(got(0)._3 > 0L && got(1)._3 < 0L) // signs match intuition
    assert(run(d.repartition(7)) === got) // order-independence is exact
  }

  test("DsirStore incremental fold equals the full recompute bit-for-bit") {
    // batch/stream parity: three batches tokenized separately and
    // appended to the store (one batch RE-appended — a foreachBatch
    // retry must be a no-op via the presence probe, not a double
    // count) give exactly the weights of one full-corpus pass
    val target = (0L until 6L).map(i => (i, "zebra quark boson lepton gluon", true))
    val raw = (10L until 22L).map(i =>
      (i, if (i % 3 == 0) "zebra quark boson photon"
          else s"apple banana cherry tok_$i grape", false))
    val d = (target ++ raw).toDF("doc_id", "text", "is_t")
    val full = Curation.dsirWeights(d, isTarget = col("is_t"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val store = java.nio.file.Files.createTempDirectory("dsir-store")
      .resolve("counts").toString
    val batchOf = pmod(col("doc_id"), lit(3L))
    operators.DsirStore.write(d.filter(batchOf === 0L), col("is_t"), store)
    operators.DsirStore.append(d.filter(batchOf === 1L), col("is_t"), store)
    operators.DsirStore.append(d.filter(batchOf === 1L), col("is_t"), store) // retry
    operators.DsirStore.append(d.filter(batchOf === 2L), col("is_t"), store)
    val incr = operators.DsirStore.weights(spark, store)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(incr === full)
    // the retry really was deduplicated at the COUNT level, not fixed
    // up downstream: every (doc, bucket) row appears exactly once
    val dupRows = operators.DsirStore.counts(spark, store)
      .groupBy(col("doc_id"), col("b")).count().filter(col("count") > 1).count()
    assert(dupRows === 0L)
  }

  test("dsirWeights rejects non-power-of-two bucket counts") {
    val d = Seq((1L, "a b c", false)).toDF("doc_id", "text", "is_t")
    intercept[IllegalArgumentException] {
      Curation.dsirWeights(d, isTarget = col("is_t"), buckets = 100)
    }
  }

  test("contamination: identical corpus -> every train doc flagged; disjoint -> none") {
    val ids = (0L until 20L)
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val same = ids.map(i => (i, text)).toDF("doc_id", "text")
    val cohorts = same
      .withColumn("cohort", Corpus.splitLabel(col("doc_id"), 0.8))
      .select("doc_id", "cohort").as[(Long, String)].collect().toMap
    val trainIds = cohorts.filter(_._2 == "train").keySet
    assert(trainIds.nonEmpty && trainIds.size < ids.size) // both cohorts hit
    val flagged = Curation.contaminationReport(same)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged === trainIds)
    assert(Curation.decontaminate(same).count() === 0)

    // per-doc unique vocabulary -> zero overlap, full train set survives
    val disjoint = ids.map(i =>
      (i, (0 to 7).map(j => s"tok_${i}_$j").mkString(" "))).toDF("doc_id", "text")
    assert(Curation.contaminationReport(disjoint).count() === 0)
    assert(Curation.decontaminate(disjoint).count() === trainIds.size)
  }

  test("bloom contamination report equals the exact report (and probes scan-side)") {
    // real corpus: bloom path must reproduce the exact rows, fpp or not
    val exact = Curation.contaminationReport(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBloom = Curation.contaminationReportBloom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom === exact && exact.nonEmpty)
    // a deliberately tiny/overloaded filter (high fpp) stays exact —
    // false positives die in the verify join
    val overloaded = Curation.contaminationReportBloom(
      docs, expectedEvalGrams = 16, fpp = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(overloaded === exact)
    // the probe is in the plan (scan-side prefilter, not a join)
    val plan = Curation.contaminationReportBloom(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
  }

  test("incrementalExact admits only unseen-content batch docs, one keeper per group") {
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "  ALPHA beta   gamma "), // normalizes to corpus doc 1 → dropped
      (11L, "zeta eta"), (12L, "zeta eta"), (13L, "Zeta   ETA"), // intra-batch dups
      (14L, "unique new text")).toDF("doc_id", "text")
    val r = operators.Dedup.incrementalExact(corpus, batch)
      .select("doc_id", "n_batch_copies")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r === Map(11L -> 3L, 14L -> 1L))
    // pre-hashed corpus frame (the maintained hash table) is honored
    val hashed = operators.Dedup.exactGroups(corpus)
    val r2 = operators.Dedup.incrementalExact(hashed, batch)
      .select("doc_id", "n_batch_copies")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r2 === r)
  }

  test("stratifiedTopN: exact sizes, deterministic, equals the naive global rank") {
    import org.apache.spark.sql.expressions.Window
    val n = 7
    val naive = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(Corpus.hashBucket(col("doc_id")), col("doc_id"))))
      .filter(col("rk") <= n)
      .select("source", "rk", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    for (nb <- Seq(1, 5, 64)) {
      val got = Curation.stratifiedTopN(docs, n, nBuckets = nb)
        .select("source", "rk", "doc_id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === naive, s"nBuckets=$nb mismatch")
    }
    // every stratum delivers exactly min(n, stratum size)
    val sizes = docs.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val per = Curation.stratifiedTopN(docs, n).groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(per === sizes.map { case (s, c) => s -> math.min(n.toLong, c) })
  }

  test("repetitionStats micro-metrics on a constructed doc") {
    val d = Seq((1L, "a a a a b")).toDF("doc_id", "text")
    val r = Curation.repetitionStats(d).collect().head
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Long]("n_distinct") === 2L)
    assert(r.getAs[Long]("dup_token_micro") === 600000L)   // 1 - 2/5
    assert(r.getAs[Long]("top_token_micro") === 800000L)   // 4/5
    // trigrams: [a a a, a a a, a a b] -> 3 total, 2 distinct
    assert(r.getAs[Long]("dup_trigram_micro") === 333333L)
  }

  test("stratifiedSample is deterministic and matches its report") {
    val s1 = Curation.stratifiedSample(docs).select("doc_id").as[Long].collect().toSet
    val s2 = Curation.stratifiedSample(docs).select("doc_id").as[Long].collect().toSet
    assert(s1 === s2 && s1.nonEmpty && s1.size < docs.count())
    val report = Curation.stratifiedSampleReport(docs).collect()
    val bySource = Curation.stratifiedSample(docs)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    report.foreach { r =>
      assert(r.getAs[Long]("n_sampled") ===
        bySource.getOrElse(r.getAs[String]("source"), 0L))
      assert(r.getAs[Int]("rate_quarters") >= 1 && r.getAs[Int]("rate_quarters") <= 4)
    }
  }

  test("qualityFilterVerdicts covers every doc with a consistent reason") {
    val v = Curation.qualityFilterVerdicts(docs)
    assert(v.count() === docs.count())
    val tooShort = v.filter($"verdict" === "too_short").select("doc_id")
    val short = docs.join(tooShort, "doc_id")
      .filter(size(graft.operators.TextAnalysis.tokens($"text")) >= 40)
    assert(short.count() === 0)
    assert(Curation.qualityFilter(docs).count() ===
      v.filter($"verdict" === "kept").count())
  }

  test("tokenHistogram buckets partition the corpus") {
    val h = Curation.tokenHistogram(docs)
    assert(h.agg(sum("n_docs")).as[Long].head === docs.count())
    h.collect().foreach { r =>
      assert(r.getAs[Long]("lo_tokens") === r.getAs[Long]("bucket") * 16)
    }
  }

  test("lineDedup drops exactly the high-df boilerplate segments") {
    // 10 docs share the same 4-token header; each has a unique body
    val boiler = "terms of use apply"
    val d = (0L until 10L).map(i =>
      (i, s"$boiler body_${i}_a body_${i}_b body_${i}_c body_${i}_d"))
      .toDF("doc_id", "text")
    val r = Curation.lineDedup(d, segTokens = 4, maxDf = 3)
      .orderBy("doc_id").collect()
    assert(r.length === 10)
    // every doc: 2 segments, the boilerplate one dropped
    r.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Long]("n_seg") === 2L)
      assert(row.getAs[Long]("n_dropped") === 1L)
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(s"body_${i}_a body_${i}_b body_${i}_c body_${i}_d"
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(row.getAs[String]("clean_md5") === expect)
    }
    // with a permissive threshold nothing is dropped
    val keepAll = Curation.lineDedup(d, segTokens = 4, maxDf = 10)
      .agg(sum("n_dropped")).head.getLong(0)
    assert(keepAll === 0L)
  }

  test("lineDedup empty-survivor doc hashes the empty string") {
    val d = (0L until 6L).map(i => (i, "all docs are the same here"))
      .toDF("doc_id", "text")
    val r = Curation.lineDedup(d, segTokens = 4, maxDf = 2).collect()
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    r.foreach { row =>
      assert(row.getAs[Long]("n_dropped") === row.getAs[Long]("n_seg"))
      assert(row.getAs[String]("clean_md5") === emptyMd5)
    }
  }

  test("mixWeights: no upsampling, binding source kept whole, mix ratios hold") {
    val w = Curation.mixWeights(docs).collect()
    assert(w.nonEmpty)
    w.foreach { r =>
      val planned = r.getAs[Long]("planned_tokens")
      val tokens = r.getAs[Long]("n_tokens")
      assert(planned <= tokens)                       // never upsample
      assert(r.getAs[Long]("weight_micro") <= 1000000L)
      assert(planned >= 0L)
    }
    // the binding source: planned == its full token count (up to the
    // integer-division floor of budget*q/sum_q, which can undershoot
    // by at most sum_q tokens)
    val sumQ = w.map(_.getAs[Long]("target_q")).sum
    val slackMin = w.map(r =>
      r.getAs[Long]("n_tokens") - r.getAs[Long]("planned_tokens")).min
    assert(slackMin >= 0L && slackMin <= sumQ)
    // planned ratios track target ratios: planned_s * q_t ~ planned_t * q_s
    val rows = w.map(r => (r.getAs[Long]("target_q"), r.getAs[Long]("planned_tokens")))
    for ((qa, pa) <- rows; (qb, pb) <- rows) {
      // integer floors introduce at most sum_q per side
      assert(math.abs(pa * qb - pb * qa) <= sumQ * math.max(qa, qb))
    }
  }

  test("gopherRules: each rule flips on a crafted violator; clean prose passes") {
    val good = (("the quick brown fox jumps with vigor and grace that " +
      "nobody have seen before of late ") * 5).trim // 80 words, stops present
    val rows = Seq(
      (1L, good),                                        // passes all
      (2L, "too short to count"),                        // rule 1: < 50 words
      (3L, ("a b c d " * 20).trim + " the of"),          // rule 2: mean len < 3
      (4L, good + " " + ("# # # # # # # # # " * 2)),     // rule 3: symbols
      (5L, (1 to 60).map(i => s"- item $i of the set").mkString("\n")), // rule 4
      (6L, (1 to 60).map(i => s"line $i of the story...").mkString("\n")), // rule 5
      (7L, ("12345 67890 " * 30).trim + " the of"),      // rule 6: no alpha
      (8L, ("zebra quokka wombat lemur fossa gecko heron ibis jackal " * 7).trim),
      // rule 4/5 BOUNDARY (Rae et al. remove only strictly-above):
      // exactly 90% bullet lines / exactly 30% ellipsis lines sit ON
      // the thresholds (both IEEE products round to the exact
      // integer micro) and must pass under the <= rule
      (9L, ((1 to 54).map(_ => "- item of the good set with extra words here") ++
        (1 to 6).map(_ => "plain line of the tale that goes on")).mkString("\n")),
      (10L, ((1 to 18).map(i => s"line $i of the story that ends...") ++
        (1 to 42).map(i => s"plain line $i of the tale with")).mkString("\n")),
      // rule 6 charset: words with NO ASCII letter are still
      // alphabetic under \p{L} (Cyrillic here; [a-z] would fail them)
      (11L, ("привет мир это хорошо очень да нет слово книга дом " * 6).trim +
        " the of and that have with")
    )                                                    // rule 7: no stop words
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val r = Curation.gopherRules(df).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("pass"), "clean prose must pass")
    assert(!r(2L).getAs[Boolean]("pass") && r(2L).getAs[Long]("n_words") < 50)
    assert(!r(3L).getAs[Boolean]("pass") &&
      r(3L).getAs[Long]("mean_word_micro") < 3000000L)
    assert(!r(4L).getAs[Boolean]("pass") &&
      r(4L).getAs[Long]("symbol_micro") > 100000L)
    assert(!r(5L).getAs[Boolean]("pass") &&
      r(5L).getAs[Long]("bullet_micro") >= 900000L)
    assert(!r(6L).getAs[Boolean]("pass") &&
      r(6L).getAs[Long]("ellipsis_micro") >= 300000L)
    assert(!r(7L).getAs[Boolean]("pass") &&
      r(7L).getAs[Long]("alpha_micro") < 800000L)
    assert(!r(8L).getAs[Boolean]("pass") &&
      r(8L).getAs[Long]("n_stop_hits") < 2)
    assert(r(9L).getAs[Boolean]("pass") &&
      r(9L).getAs[Long]("bullet_micro") === 900000L,
      "exactly 90% bullet lines must pass (paper removes only > 90%)")
    assert(r(10L).getAs[Boolean]("pass") &&
      r(10L).getAs[Long]("ellipsis_micro") === 300000L,
      "exactly 30% ellipsis lines must pass (paper removes only > 30%)")
    assert(r(11L).getAs[Boolean]("pass") &&
      r(11L).getAs[Long]("alpha_micro") === 1000000L,
      "Cyrillic-only words are alphabetic under \\p{L}")
  }

  test("curatePipeline: fused report equals the stage-by-stage operator composition") {
    val rep = Curation.curatePipeline(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // funnel is monotone per source
    rep.values.foreach { r =>
      val seq = Seq(r.getAs[Long]("n_raw"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_unique"), r.getAs[Long]("n_train"),
        r.getAs[Long]("n_clean"))
      assert(seq === seq.sorted.reverse, s"non-monotone funnel: $seq")
    }
    // stage-by-stage: quality gate, then exact dedup, then the
    // decontaminated train cohort — same operators run separately
    val q = Curation.qualityFilter(docs)
    val uniq = graft.operators.Dedup.dropExactDuplicates(q)
    val clean = Curation.decontaminate(uniq)
    val nQuality = q.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUnique = uniq.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nClean = clean.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rep.foreach { case (src, r) =>
      assert(r.getAs[Long]("n_quality") === nQuality.getOrElse(src, 0L))
      assert(r.getAs[Long]("n_unique") === nUnique.getOrElse(src, 0L))
      assert(r.getAs[Long]("n_clean") === nClean.getOrElse(src, 0L))
    }
    assert(rep.values.map(_.getAs[Long]("n_clean")).sum ===
      clean.count())
  }

  test("fullPipeline: 10-stage funnel is monotone, head agrees with curatePipeline, invariants hold") {
    val rep = Curation.fullPipeline(docs).collect()
      .map(r => r.getAs[Int]("stage_id") ->
        (r.getAs[String]("stage"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"))).toMap
    assert(rep.size === 10)
    assert((1 to 10).map(rep(_)._1) === Seq("raw", "quality", "unique",
      "train", "clean", "containment", "dsir", "mix", "shard", "pack"))
    // doc funnel monotone through the doc-set stages 1..7
    val docCounts = (1 to 7).map(rep(_)._2)
    assert(docCounts === docCounts.sorted.reverse,
      s"non-monotone doc funnel: $docCounts")
    // stages 1-5 equal the curatePipeline report summed over sources
    val cur = Curation.curatePipeline(docs).collect()
    assert(rep(1)._2 === cur.map(_.getAs[Long]("n_raw")).sum)
    assert(rep(2)._2 === cur.map(_.getAs[Long]("n_quality")).sum)
    assert(rep(3)._2 === cur.map(_.getAs[Long]("n_unique")).sum)
    assert(rep(4)._2 === cur.map(_.getAs[Long]("n_train")).sum)
    assert(rep(5)._2 === cur.map(_.getAs[Long]("n_clean")).sum)
    assert(rep(5)._3 === cur.map(_.getAs[Long]("tokens_clean")).sum)
    // UniMax at E=1 with budget = corpus plans every token: the mix
    // stage's planned total equals the stage-7 survivor tokens, and
    // the shard stage redistributes exactly those tokens
    assert(rep(8)._3 === rep(7)._3, "mix must plan the survivor tokens")
    assert(rep(9)._3 === rep(7)._3, "shards must carry the survivor tokens")
    // packing re-counts chunk tokens, which the 8-token overlap can
    // only inflate (stride 24 re-emits up to 8 tokens per extra chunk)
    assert(rep(10)._3 >= rep(7)._3)
  }

  // synthetic corpus with one word per token unit: source sizes in
  // tokens are exact and tiny, so every waterfilling branch is
  // checkable by hand
  private def unimaxCorpus(sizes: Map[String, Int]) = {
    import spark.implicits._
    sizes.toSeq.flatMap { case (src, n) =>
      Seq((src, Seq.fill(n)("w").mkString(" ")))
    }.toDF("source", "text")
  }

  test("unimaxMix: feasible budget -> capped prefix at cap, rest split evenly, sum == budget") {
    // caps (E=1): a=10 b=20 c=70 d=80, budget 100
    // a: 10*4 < 100 -> capped; b: 20*3 < 90 -> capped;
    // c: 70*2 >= 70 -> uncapped. left=70, slots=2, share=35 rem=0
    val d = unimaxCorpus(Map("a" -> 10, "b" -> 20, "c" -> 70, "d" -> 80))
    val r = Curation.unimaxMix(d, epochCap = 1, budgetTokens = Some(100L))
      .collect().map(x => x.getAs[String]("source") -> x.getAs[Long]("planned_tokens")).toMap
    assert(r === Map("a" -> 10L, "b" -> 20L, "c" -> 35L, "d" -> 35L))
  }

  test("unimaxMix: even-split remainder lands one token each on the largest sources") {
    // budget 101 over the same corpus: share=35 rem=1 -> d gets 36
    val d = unimaxCorpus(Map("a" -> 10, "b" -> 20, "c" -> 70, "d" -> 80))
    val r = Curation.unimaxMix(d, epochCap = 1, budgetTokens = Some(101L))
      .collect().map(x => x.getAs[String]("source") -> x.getAs[Long]("planned_tokens")).toMap
    assert(r === Map("a" -> 10L, "b" -> 20L, "c" -> 35L, "d" -> 36L))
    assert(r.values.sum === 101L)
  }

  test("unimaxMix: infeasible budget caps every source; epochs_micro == epochCap exactly") {
    val d = unimaxCorpus(Map("a" -> 10, "b" -> 20))
    val r = Curation.unimaxMix(d, epochCap = 2, budgetTokens = Some(1000L)).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("planned_tokens") ===
        row.getAs[Long]("cap_tokens"))
      assert(row.getAs[Long]("epochs_micro") === 2000000L)
    }
  }

  test("unimaxMix: default one-corpus budget allocates it fully and respects the cap") {
    val r = Curation.unimaxMix(docs).collect()
    val budget = r.map(_.getAs[Long]("n_tokens")).sum
    assert(r.map(_.getAs[Long]("planned_tokens")).sum === budget)
    // E=1 with near-uniform sources: the small ones bind at exactly
    // one epoch, nobody exceeds it by more than the remainder token
    r.foreach { row =>
      assert(row.getAs[Long]("planned_tokens") <=
        row.getAs[Long]("cap_tokens") + r.length)
    }
    assert(r.count(row => row.getAs[Long]("planned_tokens") ===
      row.getAs[Long]("cap_tokens")) >= 1)
  }
}
