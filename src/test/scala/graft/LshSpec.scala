package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LshDedup, Media, Similarity, TextAnalysis}
import graft.sources.Tables

class LshSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)

  test("minhash LSH candidates contain every truly-similar pair (recall on high-Jaccard)") {
    // ground truth: all pairs with jaccard >= 0.8 via brute force on 50 docs
    val sample = docs.filter($"doc_id" < 50)
    val sh = LshDedup.shingleHashes(sample)
    val truth = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .withColumn("j", Dedup.jaccard($"a.shingle_hashes", $"b.shingle_hashes"))
      .filter($"j" >= 0.8)
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
    val cands = LshDedup.minhashCandidates(sample)
    val missed = truth.join(cands, Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() === 0)
  }

  test("BandStore incremental candidates == full recompute restricted to batch pairs") {
    import graft.operators.{BandStore, Corpus}
    val dir = java.nio.file.Files.createTempDirectory("band-store").toString
    val corpus = docs.filter(Corpus.splitLabel($"doc_id", 0.8) === "train")
    val batch = docs.filter(Corpus.splitLabel($"doc_id", 0.8) === "eval")
    BandStore.write(corpus, dir)

    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = key(BandStore.incrementalCandidates(spark, dir, batch))

    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = key(LshDedup.minhashCandidates(docs))
      .filter { case (a, b) => batchIds(a) || batchIds(b) }
    assert(incr === full && incr.nonEmpty)

    // folding the accepted batch in makes the store equal a from-
    // scratch band table over the whole corpus
    BandStore.append(batch, dir)
    def bandKey(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "band", "band_hash").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(bandKey(BandStore.bandTable(spark, dir)) ===
      bandKey(LshDedup.bandTable(docs)))

    // idempotent under foreachBatch retry: re-appending the same batch
    // adds no rows (a duplicated band row would surface as self-pairs
    // and a doubled bucket size against the skew cap)
    val rowsBefore = BandStore.bandTable(spark, dir).count()
    BandStore.append(batch, dir)
    assert(BandStore.bandTable(spark, dir).count() === rowsBefore)

    // compaction rewrites the accumulated append files without
    // changing a single row
    val before = bandKey(BandStore.bandTable(spark, dir))
    BandStore.compact(spark, dir)
    assert(bandKey(BandStore.bandTable(spark, dir)) === before)
    val root = new java.io.File(dir)
    val bandDirs = root.listFiles().filter(_.getName.startsWith("band="))
    assert(bandDirs.nonEmpty && bandDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) === 1),
      "each band partition should compact to one file at this size")
  }

  test("jaccardVerified only keeps pairs above threshold and is symmetric-free") {
    val v = LshDedup.jaccardVerified(docs, threshold = 0.5).collect()
    assert(v.nonEmpty)
    assert(v.forall(r => r.getAs[Double]("jaccard") >= 0.5))
    assert(v.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("pair joins release their shingle cache after the first action (no block leak)") {
    def newlyPersisted(before: Set[Int]): Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet.diff(before)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    LshDedup.exactJaccardPairsCounted(docs, threshold = 0.5).count()
    LshDedup.exactJaccardPairsPrefix(docs, threshold = 0.5).count()
    LshDedup.jaccardVerified(docs, threshold = 0.5).count()
    // the QueryExecutionListener fires asynchronously; poll briefly
    val deadline = System.currentTimeMillis + 15000
    while (newlyPersisted(before).nonEmpty && System.currentTimeMillis < deadline)
      Thread.sleep(50)
    assert(newlyPersisted(before) === Set.empty[Int])
  }

  test("winnowFingerprints == per-doc brute-force winnowing; shared runs share a fingerprint") {
    import org.apache.spark.sql.graft.{ShingleHashes, TokenFnvHashes}
    import org.apache.spark.unsafe.types.UTF8String
    val n = 3; val w = 4
    val sample = docs.filter($"doc_id" < 60)
    // independent reference: same static kernels, driver-side sliding min
    def brute(text: String): Set[Long] = {
      val toks = TokenFnvHashes.hashes(
        UTF8String.fromString(text.trim.toLowerCase))
      val sh = ShingleHashes.shingles(toks, n, false)
      if (sh.length < w) Set.empty
      else (w - 1 until sh.length).map(i => sh.slice(i - w + 1, i + 1).min).toSet
    }
    val expect = sample.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> brute(r.getString(1))).toMap
    val got = LshDedup.winnowFingerprints(sample, n = n, w = w).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    expect.filter(_._2.nonEmpty).foreach { case (id, fps) =>
      assert(got.getOrElse(id, Set.empty) === fps, s"doc $id")
    }
    // guarantee: two docs sharing a token run of >= w+n-1 tokens share
    // a fingerprint (the winnowing correctness property)
    val shared = (1 to (w + n - 1)).map(i => s"shared$i").mkString(" ")
    val pair = Seq(
      (9001L, s"alpha beta gamma $shared delta epsilon"),
      (9002L, s"one two $shared three four five six")).toDF("doc_id", "text")
    val fps = LshDedup.winnowFingerprints(pair, n = n, w = w).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(9001L) intersect fps(9002L)).nonEmpty)
  }

  test("simhash: identical docs get identical signature; near-dups close in hamming") {
    val twice = docs.limit(5).union(docs.limit(5))
    val sigs = LshDedup.simhashes(twice).groupBy("doc_id")
      .agg(countDistinct("simhash").as("n"))
    assert(sigs.filter($"n" =!= 1).count() === 0)
    // candidates from the pigeonhole bucketing must respect the budget
    val c = LshDedup.simhashCandidates(docs, maxHamming = 6).collect()
    assert(c.forall(_.getAs[Int]("hamming") <= 6))
  }

  test("simhashCandidates: exact recall — every true hamming<=h pair survives entropy chunking") {
    // ground truth: brute-force hamming over all signature pairs; the
    // pigeonhole guarantee must hold for WHATEVER bit->chunk
    // assignment the per-bit entropy stats produce on this corpus
    val sigs = LshDedup.simhashes(docs.limit(200)).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val truth = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 6
    } yield (ida, idb, h)).toSet
    val got = LshDedup.simhashCandidates(docs.limit(200), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === truth, s"missing=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
  }

  test("simhashCandidatesCapped: equals exact form when cap not binding; drops degenerate buckets") {
    // real corpus, generous cap: identical answer to the exact miner
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = key(LshDedup.simhashCandidates(docs.limit(200), maxHamming = 6))
    val capped = key(LshDedup.simhashCandidatesCapped(docs.limit(200),
      maxHamming = 6, maxBucket = 2000))
    assert(capped === exact)
    // degenerate spam corpus: 40 IDENTICAL docs, cap 10 — identical
    // signatures defeat ANY bit split (rounds 7-11 dropped these
    // buckets, which round 11 measured as the default cap's 42%
    // recall loss at 500k docs). The round-12 clique collapse emits
    // their hamming-0 pairs directly — all 780, output-sized work —
    // and bucketing (which now sees ONE distinct signature) never
    // exceeds the cap: zero drops, exact answer.
    val spam = spark.createDataFrame(
      (1L to 40L).map(i => (i, "the same spam text repeated verbatim")))
      .toDF("doc_id", "text")
    val spamPairs = LshDedup.simhashCandidatesCapped(spam, maxHamming = 6,
      maxBucket = 10).collect()
    assert(spamPairs.length === (40 * 39) / 2)
    assert(spamPairs.forall(_.getAs[Int]("hamming") === 0))
    assert(spamPairs.forall(r => r.getLong(0) < r.getLong(1)))
    val st = LshDedup.simhashDropStats(spam, maxHamming = 6, maxBucket = 10)
      .head()
    assert(st.getAs[Long]("n_buckets_dropped") === 0L)
    assert(st.getAs[Long]("n_sig_slots_dropped") === 0L)
    assert(st.getAs[Long]("n_cliques_dropped") === 0L)
    assert(st.getAs[Long]("n_clique_pairs_dropped") === 0L)
  }

  test("maxClique bounds the raw-corpus spam-clique emission, with drops reported") {
    // a RAW corpus (no exact dedup first) with a 40-copy clique: the
    // default emits all 780 internal pairs; maxClique=10 withholds
    // them — bounded work on the uncappable path — and the drop stats
    // name exactly what was withheld. Near-neighbor mining through
    // the clique's signature is unaffected.
    val spam = spark.createDataFrame(
      (1L to 40L).map(i => (i, "the same spam text repeated verbatim")))
      .toDF("doc_id", "text")
    val capped = LshDedup.simhashCandidatesCapped(spam, maxHamming = 6,
      maxBucket = 10, maxClique = 10).count()
    assert(capped === 0L, "internal pairs of an oversized clique must drop")
    val st = LshDedup.simhashDropStats(spam, maxHamming = 6, maxBucket = 10,
      maxClique = 10).head()
    assert(st.getAs[Long]("n_cliques_dropped") === 1L)
    assert(st.getAs[Long]("n_clique_pairs_dropped") === (40L * 39L) / 2L)
    // cap above the clique size: nothing drops
    val st2 = LshDedup.simhashDropStats(spam, maxHamming = 6, maxBucket = 10,
      maxClique = 40).head()
    assert(st2.getAs[Long]("n_cliques_dropped") === 0L)
  }

  test("nearDupCandidates size gate: simhash family under the envelope, band path above") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d = docs.limit(120)
    // gate open: the simhash miner's pairs, exactly
    val under = key(LshDedup.nearDupCandidates(d, maxSimhashDocs = 1000,
      maxHamming = 6))
    val simhash = key(LshDedup.simhashCandidatesCapped(d, maxHamming = 6)
      .select($"doc_a", $"doc_b"))
    assert(under === simhash)
    // gate closed (envelope forced below the corpus): the minhash
    // band path's candidates, exactly
    val over = key(LshDedup.nearDupCandidates(d, maxSimhashDocs = 10,
      maxHamming = 6))
    val minhash = key(LshDedup.minhashCandidates(d))
    assert(over === minhash)
    // a caller-supplied count is trusted as-is (no recount action):
    // the same 120-doc frame routes by the CLAIMED size
    assert(key(LshDedup.nearDupCandidates(d, maxSimhashDocs = 1000,
      maxHamming = 6, docCount = Some(5000L))) === minhash)
    assert(key(LshDedup.nearDupCandidates(d, maxSimhashDocs = 10,
      maxHamming = 6, docCount = Some(7L))) === simhash)
  }

  test("simhash two-level split: distinct-signature hot buckets are split, not dropped") {
    // a corpus whose signatures are DISTINCT but agree on the
    // low-entropy chunks (the measured sf1 failure shape): real docs
    // with a tiny cap that the one-level guard would trip on
    val d = docs.limit(200)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = key(LshDedup.simhashCandidates(d, maxHamming = 6))
    // cap 40 << 200: level-1 buckets on a 31-word-vocab corpus blow
    // the cap, but the complement split rescues the true pairs
    val capped = key(LshDedup.simhashCandidatesCapped(d, maxHamming = 6,
      maxBucket = 40))
    assert(capped.subsetOf(exact))
    assert(capped.size >= (exact.size * 9) / 10,
      s"split recall ${capped.size}/${exact.size} must be >= 90%")
  }

  test("capped miner is exact on clique-heavy corpora; recall report composes") {
    // through round 11 a 300-copy spam cluster blew every bucket it
    // touched past the cap and lost its 44,850 pairs (plus real pairs
    // sharing those buckets) — the measured 42% recall loss at 500k
    // docs. The round-12 clique collapse makes the same corpus EXACT:
    // identical signatures are one mining unit, their pairs emitted
    // output-sized; the tiny cap binds on nothing
    val base = docs.limit(150).select($"doc_id", $"text")
    val spamText = "the same spam text repeated verbatim across the corpus"
    val spam = spark.range(10000, 10300)
      .select($"id".as("doc_id"), lit(spamText).as("text"))
    val corpus = base.union(spam)
    val cap = 50
    val exactRaw = LshDedup.simhashCandidates(corpus, maxHamming = 6).count()
    val cappedRaw = LshDedup.simhashCandidatesCapped(corpus,
      maxHamming = 6, maxBucket = cap).count()
    assert(cappedRaw === exactRaw,
      s"deep recursion + clique collapse must be exact here: $cappedRaw/$exactRaw")
    // the composed recall report (exact content dedup first, the
    // production order) stays coherent: capped ⊆ exact, recall 1.0
    val rep = LshDedup.simhashCappedRecallReport(corpus,
      maxHamming = 6, maxBucket = cap).head()
    assert(rep.getAs[Long]("n_docs") === 450L)
    assert(rep.getAs[Long]("n_survivors") <= 151L)
    assert(rep.getAs[Long]("n_pairs_capped") === rep.getAs[Long]("n_pairs_exact"))
    assert(rep.getAs[Long]("recall_micro") === 1000000L)
  }

  test("terminal handling: enumeration makes tiny caps exact; maxEnum=0 drops and reports") {
    val d = docs.limit(200)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = key(LshDedup.simhashCandidates(d, maxHamming = 6))
    // depth 1, maxEnum 0 = the round-7 one-level DROP guard: buckets
    // over the cap vanish, reported — the recall floor
    val dropped = key(LshDedup.simhashCandidatesCapped(d, maxHamming = 6,
      maxBucket = 5, maxDepth = 1, maxEnum = 0))
    assert(dropped.subsetOf(exact))
    val st = LshDedup.simhashDropStats(d, maxHamming = 6, maxBucket = 5,
      maxDepth = 1, maxEnum = 0).head()
    assert(st.getAs[Long]("n_buckets_dropped") > 0L,
      "a 5-cap one-level guard must drop buckets on 200 docs")
    assert(st.getAs[Long]("n_sig_slots_dropped") >
      st.getAs[Long]("n_buckets_dropped"))
    // depth 1 with the default enumerator: terminal buckets ≤ maxEnum
    // are exactly enumerated instead — the answer is EXACT even at a
    // pathological cap, and nothing is dropped
    val enumerated = key(LshDedup.simhashCandidatesCapped(d, maxHamming = 6,
      maxBucket = 5, maxDepth = 1))
    assert(enumerated === exact,
      s"enumeration must make depth-1 cap-5 exact: ${enumerated.size}/${exact.size}")
    val st2 = LshDedup.simhashDropStats(d, maxHamming = 6, maxBucket = 5,
      maxDepth = 1).head()
    assert(st2.getAs[Long]("n_buckets_dropped") === 0L)
    // recursion between the floor and the enumerator recovers pairs
    val deep = key(LshDedup.simhashCandidatesCapped(d, maxHamming = 6,
      maxBucket = 5, maxEnum = 0))
    assert(dropped.subsetOf(deep) && deep.subsetOf(exact))
    assert(deep.size > dropped.size,
      s"recursion must recover pairs: depth1=${dropped.size} deep=${deep.size}")
  }

  test("simhashBitOrder: one stats scan per input shared across simhash calls; explicit order is lazy") {
    val d = docs.limit(150)
    val before = LshDedup.statsScans.get()
    val a = LshDedup.simhashCandidates(d, maxHamming = 6)
    val b = LshDedup.simhashCandidatesCapped(d, maxHamming = 6, maxBucket = 2000)
    val c = LshDedup.simhashDropStats(d, maxHamming = 6, maxBucket = 2000)
    a.collect(); b.collect(); c.collect()
    // memo: the three calls share at most ONE ones-rate scan (zero if
    // an earlier test already cached this exact input plan)
    assert(LshDedup.statsScans.get() - before <= 1)
    // an explicitly supplied order runs no stats job at construction
    // OR execution — the streaming/plan-only path
    val mid = LshDedup.statsScans.get()
    val fixed = LshDedup.simhashCandidates(d, maxHamming = 6,
      bitOrder = Some(0 until 64))
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fk = key(fixed)
    assert(LshDedup.statsScans.get() === mid)
    // chunking-invariance: any disjoint bit partition, same answer
    assert(fk === key(a))
  }

  test("knnBrute: rank 1 is the vector itself; sims sorted descending") {
    val knn = Similarity.knnBrute(emb, emb.filter($"vec_id" < 2), topK = 5).collect()
    val byQ = knn.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.head.getAs[Long]("vec_id") === q) // self at rank 1
      assert(sorted.head.getAs[Double]("sim") > 0.999999)
      val sims = sorted.map(_.getAs[Double]("sim")).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("multi-probe annLsh recall >= single-probe recall") {
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.knnBrute(emb, queries, topK = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(p: Int) = {
      val ann = Similarity.annLsh(emb, queries, topK = 5, nBits = 4, probes = p)
        .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & ann).size.toDouble / brute.size
    }
    val r0 = recall(0); val r1 = recall(1)
    assert(r1 >= r0, s"multi-probe recall $r1 < single $r0")
    assert(r1 >= 0.5, s"multi-probe recall $r1 too low")
  }

  test("annLsh achieves decent recall vs brute force") {
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.knnBrute(emb, queries, topK = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(emb, queries, topK = 5, nBits = 2)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall") // 2-bit buckets on random vectors
    // every ANN result must come from the right bucket ⇒ subset sanity:
    assert(ann.forall { case (q, _) => queries.filter($"vec_id" === q).count() == 1 })
  }

  test("annInt8 with corpus-sized coarseK equals brute force exactly") {
    // when nothing is cut at the coarse stage, the re-rank IS the
    // brute-force ranking — int8 scoring may only affect the cut
    val queries = emb.filter($"vec_id" < 5)
    val n = emb.count().toInt
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = keyed(Similarity.knnBrute(emb, queries, topK = 5))
    val full = keyed(Similarity.annInt8(emb, queries, topK = 5, coarseK = n))
    assert(full === brute)
  }

  test("annInt8 recall at modest coarseK; int8 codes stay in [-127, 127]") {
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.knnBrute(emb, queries, topK = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annInt8(emb, queries, topK = 5, coarseK = 50)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.8, s"int8 coarse recall $recall too low")
    val codes = Similarity.quantizeInt8(emb, Similarity.dimScales(emb))
      .select(explode($"qvec")).as[Byte].collect()
    assert(codes.forall(b => b >= -127 && b <= 127))
    assert(codes.exists(_ == 127) || codes.exists(_ == -127)) // scale binds
  }

  test("annPq with corpus-sized coarseK equals brute force exactly") {
    // when nothing is cut at the coarse ADC stage, the exact re-rank
    // IS brute force — quantization may only affect the cut
    val queries = emb.filter($"vec_id" < 5)
    val n = emb.count().toInt
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = keyed(Similarity.knnBrute(emb, queries, topK = 5))
    val full = keyed(Similarity.annPq(emb, queries, topK = 5, coarseK = n))
    assert(full === brute)
  }

  test("annIvfPq with all cells probed and corpus-sized coarseK equals brute force") {
    // probing every cell makes the IVF stage a no-op and a
    // corpus-sized coarseK makes the ADC stage a no-op — the exact
    // re-rank IS brute force, so the composed index may only affect
    // the cut, never the surviving ranks
    val queries = emb.filter($"vec_id" < 5)
    val n = emb.count().toInt
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = keyed(Similarity.knnBrute(emb, queries, topK = 5))
    val full = keyed(Similarity.annIvfPq(emb, queries, topK = 5,
      coarseK = n, nCells = 8, nProbe = 8))
    assert(full === brute)
  }

  test("annIvfPq candidates come only from probed cells; recall at modest knobs") {
    val queries = emb.filter($"vec_id" < 10)
    val ann = Similarity.annIvfPq(emb, queries, topK = 5,
      coarseK = 50, nCells = 16, nProbe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every returned vector sits in one of its query's 4 probed cells:
    // ivfSearch with a corpus-sized topK enumerates exactly the
    // probed-cell membership per query
    val cents = Similarity.ivfCentroids(emb, nCells = 16)
    val probed = Similarity.ivfSearch(Similarity.ivfIndex(emb, 16), cents,
      queries, topK = emb.count().toInt, nProbe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.forall(probed.contains),
      "a returned vector was outside its query's probed cells")
    // recall vs brute force: IVF pruning + PQ coarse cut still keep
    // most true neighbors at these knobs on the test corpus
    val brute = Similarity.knnBrute(emb, queries, topK = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVFADC recall $recall too low")
  }

  test("annPq recall at modest coarseK; codes compress to nSub small ints") {
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.knnBrute(emb, queries, topK = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annPq(emb, queries, topK = 5, coarseK = 50)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ coarse recall $recall too low")
    // the compressed representation: nSub rows per vector, each one
    // of ≤ nCodes distinct code ids (dictionary-encodes to 4 bits) —
    // 64 float dims become 8 half-byte codes
    val qv = Similarity.quantizeInt8(emb, Similarity.dimScales(emb))
    val codes = Similarity.pqEncode(qv,
      Similarity.pqCodebook(qv, nSub = 8, subDim = 8, nCodes = 16),
      nSub = 8, subDim = 8)
    val n = emb.count()
    assert(codes.count() === n * 8)
    assert(codes.agg(countDistinct($"code")).head().getLong(0) <= 16)
  }

  test("lshNearDupPairs ⊆ cosineNearDupPairs with identical sims") {
    val exact = Similarity.cosineNearDupPairs(emb, 0.4)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(emb, 0.4, nBits = 2)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("prefix-filtered exact Jaccard == count-based exact Jaccard at every threshold") {
    for (t <- Seq(0.2, 0.5, 0.8)) {
      val counted = LshDedup.exactJaccardPairsCounted(docs, t)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val prefixed = LshDedup.exactJaccardPairsPrefix(docs, t)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(prefixed === counted, s"threshold $t mismatch")
      if (t == 0.8) assert(counted.nonEmpty)
    }
  }

  test("prefix filter survives integer-boundary threshold·len double rounding") {
    // t=0.55, len=100 is a point where double(0.55)*100 =
    // 55.00000000000001 — without the 1e-9 slack inside the ceil the
    // prefix shrinks from 46 to 45 and this pair is silently dropped.
    // Geometry: doc 2's tokens are a contiguous suffix of doc 1's, so
    // its 55 shingles are exactly the shared set; doc 1 adds 45
    // unique (df=1) shingles which sort FIRST in the rarest-first
    // order and fill prefix slots 0..44 — the one shared element a
    // join can match sits exactly at slot 45, the slot the rounding
    // bug cuts. Jaccard = 55/100 = exactly the threshold.
    val sTok = (1 to 57).map(i => s"sh$i").mkString(" ")
    val xTok = (1 to 45).map(i => s"xa$i").mkString(" ") + " " + sTok
    val d2 = Seq((1L, xTok), (2L, sTok)).toDF("doc_id", "text")
    val pref = LshDedup.exactJaccardPairsPrefix(d2, threshold = 0.55)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cnt = LshDedup.exactJaccardPairsCounted(d2, threshold = 0.55)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cnt === Set((1L, 2L)))
    assert(pref === cnt)
  }

  test("containmentPairs finds the quote-in-article pair Jaccard misses") {
    // doc 2 is verbatim inside doc 1, which is ~7× larger: containment
    // (2 in 1) = 1.0 but Jaccard ≈ 1/7 — under the symmetric miner's
    // t=0.5 length filter this pair could never even form
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val article = (1 to 70).map(i => s"w$i").mkString(" ") + " " + quote
    val d = Seq((1L, article), (2L, quote)).toDF("doc_id", "text")
    val got = LshDedup.containmentPairs(d, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got === List((2L, 1L, 1.0))) // asymmetric: only quote→article
    val jac = LshDedup.exactJaccardPairs(d, threshold = 0.5)
      .collect()
    assert(jac.isEmpty)
  }

  test("containmentPairs == brute-force all-ordered-pairs containment (incl. boundary)") {
    // deterministic mini corpus with overlapping token windows so
    // many partial containments exist; includes exact-boundary ratios
    val docs = (0L until 24L).map { i =>
      val start = (i * 7) % 40
      val len = 5 + (i % 13)
      val toks = (start until (start + len)).map(j => s"t${j % 52}")
      (i, toks.mkString(" "))
    }
    val d = docs.toDF("doc_id", "text")
    val t = 0.5
    val got = LshDedup.containmentPairs(d, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sets = LshDedup.shingleHashes(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a != b && sa.nonEmpty
      c = (sa & sb).size.toDouble / sa.size
      if c >= t
    } yield (a, b, c)).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("containmentPairsCapped finds the quote-in-article pair at scale semantics") {
    // the flagship pair class the scale path exists for: the capped
    // miner must find it without the exact quadratic join (every
    // shingle here is rare, so no cap interferes)
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val article = (1 to 70).map(i => s"w$i").mkString(" ") + " " + quote
    val d = Seq((1L, article), (2L, quote)).toDF("doc_id", "text")
    val got = LshDedup.containmentPairsCapped(d, threshold = 0.9, maxDf = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got === List((2L, 1L, 1.0)))
  }

  test("containmentPairsCapped == containmentPairs when no shingle exceeds the cap") {
    // same overlapping-window corpus as the exact brute-force test;
    // with maxDf above the corpus's max document frequency the cap
    // never binds and the capped miner must equal the exact one —
    // including boundary ratios
    val docs = (0L until 24L).map { i =>
      val start = (i * 7) % 40
      val len = 5 + (i % 13)
      val toks = (start until (start + len)).map(j => s"t${j % 52}")
      (i, toks.mkString(" "))
    }
    val d = docs.toDF("doc_id", "text")
    val t = 0.5
    val exact = LshDedup.containmentPairs(d, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = LshDedup.containmentPairsCapped(d, threshold = t, maxDf = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(capped === exact)
  }

  test("containmentPairsCapped cap semantics: over-cap shingles carry no candidates") {
    // maxDf = 1 makes EVERY shared shingle over-cap, so no candidate
    // can form — the one deterministic corner where the cap's bite is
    // total; the recall report must say so rather than hide it
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val article = (1 to 70).map(i => s"w$i").mkString(" ") + " " + quote
    val d = Seq((1L, article), (2L, quote)).toDF("doc_id", "text")
    assert(LshDedup.containmentPairsCapped(d, threshold = 0.9, maxDf = 1L)
      .collect().isEmpty)
    val rep = LshDedup.containmentCappedRecallReport(d, threshold = 0.9,
      maxDf = 1L).collect().head
    assert(rep.getAs[Long]("n_docs") === 2L)
    assert(rep.getAs[Long]("n_pairs_exact") === 1L)
    assert(rep.getAs[Long]("n_pairs_capped") === 0L)
    assert(rep.getAs[Long]("n_grams_capped") > 0L)
    assert(rep.getAs[Long]("recall_micro") === 0L)
    // and with the cap lifted the report certifies full recall with
    // the cap provably not firing
    val rep2 = LshDedup.containmentCappedRecallReport(d, threshold = 0.9,
      maxDf = 1000L).collect().head
    assert(rep2.getAs[Long]("recall_micro") === 1000000L)
    assert(rep2.getAs[Long]("n_grams_capped") === 0L)
  }

  test("containmentPairsCapped prefix honors the rarest-first (df, signed hash) order") {
    // a true pair whose ONLY rare shared shingles sit in the probe's
    // rarest-first prefix: doc 0 = shared block + unique tail; docs
    // 1..4 all contain the shared block, making its shingles COMMON
    // (df = 5) relative to the tail (df = 1). With t such that the
    // prefix covers the whole set the pair forms through the rare
    // tail... conversely capping at maxDf = 4 kills exactly the
    // common-block candidates, so a pair linked ONLY through the
    // block disappears while block+tail sharers survive.
    val block = (1 to 20).map(i => s"b$i").mkString(" ")
    val tail0 = (1 to 10).map(i => s"u$i").mkString(" ")
    // doc 0: block + unique tail; doc 9: same block + SAME tail (a
    // genuine near-dup through rare content); docs 1..4: block + own
    // unique padding (linked to doc 0 only through the common block)
    val rows = Seq(
      (0L, s"$block $tail0"),
      (9L, s"$block $tail0")) ++
      (1L to 4L).map(i => (i, s"$block " + (1 to 10).map(j => s"p${i}_$j").mkString(" ")))
    val d = rows.toDF("doc_id", "text")
    val t = 0.5
    val exact = LshDedup.containmentPairs(d, threshold = t)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // block shingles have df = 6 (all docs), tail shingles df = 2
    // (docs 0 and 9): a cap of 4 keeps tail candidates, drops block
    val capped = LshDedup.containmentPairsCapped(d, threshold = t, maxDf = 4L)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the rare-content near-dup 0↔9 survives the cap in both directions
    assert(capped.contains((0L, 9L)) && capped.contains((9L, 0L)))
    // block-only pairs (e.g. 1→2: everything shared is over-cap) die
    assert(exact.contains((1L, 2L)))
    assert(!capped.contains((1L, 2L)))
    // and capped ⊆ exact (the cap only removes pairs)
    assert(capped.subsetOf(exact))
  }

  test("containmentPairsCapped work budget clamps the cap deterministically") {
    // same fixture as the prefix-order test; df classes: 40 grams at
    // df=1 (Σdf²=40), 10 at df=2 (cum 80), 18 at df=6 (cum 728).
    // A budget of 300 admits the df≤2 classes only — the rare-content
    // near-dup 0↔9 (linked through df=2 tail grams) survives while
    // block-only pairs (df=6) die; a budget below the first class
    // clamps to cap 0 and the miner must go EMPTY (bounded, not
    // exploding — the sf10 saturation lesson), with dropStats saying
    // everything was capped rather than hiding it.
    val block = (1 to 20).map(i => s"b$i").mkString(" ")
    val tail0 = (1 to 10).map(i => s"u$i").mkString(" ")
    val rows = Seq(
      (0L, s"$block $tail0"),
      (9L, s"$block $tail0")) ++
      (1L to 4L).map(i => (i, s"$block " + (1 to 10).map(j => s"p${i}_$j").mkString(" ")))
    val d = rows.toDF("doc_id", "text")
    val mid = LshDedup.containmentPairsCapped(d, threshold = 0.5,
        maxDf = 1000L, maxCandidateBudget = 300L)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mid.contains((0L, 9L)) && mid.contains((9L, 0L)))
    assert(!mid.contains((1L, 2L)))
    assert(LshDedup.containmentPairsCapped(d, threshold = 0.5,
      maxDf = 1000L, maxCandidateBudget = 10L).collect().isEmpty)
    val ds = LshDedup.containmentDropStats(d, maxDf = 1000L,
      maxCandidateBudget = 10L).collect().head
    assert(ds.getAs[Long]("n_grams_capped") === 68L) // every distinct gram
  }

  test("containmentPairsCapped percent cap folds corpus-relative") {
    // 10 docs all sharing one common block; with maxDfPercent=50 the
    // effective cap is ⌈50%·10⌉ = 5 < 10, so the block's shingles are
    // over-cap boilerplate; at 100% the cap is min(maxDf, 10) and
    // nothing drops — "common" must scale with the corpus, not sit at
    // an absolute df
    val block = (1 to 10).map(i => s"c$i").mkString(" ")
    val d = (0L until 10L)
      .map(i => (i, s"$block " + (1 to 6).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val dropped = LshDedup.containmentDropStats(d, maxDf = 1000L, maxDfPercent = 50)
      .collect().head
    assert(dropped.getAs[Long]("n_grams_capped") > 0L)
    val kept = LshDedup.containmentDropStats(d, maxDf = 1000L, maxDfPercent = 100)
      .collect().head
    assert(kept.getAs[Long]("n_grams_capped") === 0L)
    // and the pair sets respond to the fold: at 50% the block carries
    // no candidates (docs share ONLY the block → no pairs), at 100%
    // block-linked pairs appear iff containment clears the threshold
    assert(LshDedup.containmentPairsCapped(d, threshold = 0.5,
      maxDf = 1000L, maxDfPercent = 50).collect().isEmpty)
  }

  test("bitOrderCache stays bounded across many distinct inputs") {
    // a long-lived session mining many distinct corpora must not
    // accumulate memo entries without bound: past BitOrderCacheMax
    // one arbitrary entry is evicted before admitting a new key, so
    // hot memos on other live corpora survive (losing a memo costs
    // one stats re-scan, never correctness — the order is perf-only)
    for (i <- 0 until LshDedup.BitOrderCacheMax * 2) {
      LshDedup.bitOrderCached(s"lshspec-bound-$i")(0 until 64)
      assert(LshDedup.bitOrderCacheSize <= LshDedup.BitOrderCacheMax)
    }
    // a key already present is NOT evicted by re-access at the bound
    val k = "lshspec-bound-present"
    LshDedup.bitOrderCached(k)(Seq(1, 2, 3))
    assert(LshDedup.bitOrderCached(k)(sys.error("must be memoized")) === Seq(1, 2, 3))
  }

  test("blockedNearDupPairs == cosineNearDupPairs exactly (all block counts)") {
    val exact = Similarity.cosineNearDupPairs(emb, 0.4)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    for (nb <- Seq(1, 3, 16)) {
      val blocked = Similarity.blockedNearDupPairs(emb, 0.4, nBlocks = nb)
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked === exact, s"nBlocks=$nb mismatch")
    }
  }

  test("minhashEstimates: exact 1e6 on identical docs, bounded micro units elsewhere") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq((1L, text), (2L, text),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (4L, "totally different words entirely here now okay then")).toDF("doc_id", "text")
    val r = LshDedup.minhashEstimates(d).collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3)))).toMap
    // identical docs: estimate AND exact at exactly 10^6
    assert(r((1L, 2L)) === ((1000000L, 1000000L)))
    // every metric in range; near-dup pair estimates high
    assert(r.values.forall { case (e, j) =>
      e >= 0L && e <= 1000000L && j >= 0L && j <= 1000000L })
    r.get((1L, 3L)).foreach { case (e, j) =>
      assert(j > 500000L && e > 250000L) }
  }

  test("knnGraph == per-vector brute-force top-k (excluding self), all block counts") {
    // brute force oracle: knnBrute with every vector as a query keeps
    // self at rank 1 — drop it and shift ranks
    val brute = Similarity.knnBrute(emb, emb, topK = 6).collect()
      .filter(r => r.getAs[Long]("query_id") != r.getAs[Long]("vec_id"))
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank")).take(5)
          .map(_.getAs[Long]("vec_id")).toSeq
      }
    for (nb <- Seq(1, 4)) {
      val graph = Similarity.knnGraph(emb, k = 5, nBlocks = nb).collect()
        .groupBy(_.getAs[Long]("vec_id"))
        .map { case (v, rows) =>
          v -> rows.sortBy(_.getAs[Int]("rank"))
            .map(_.getAs[Long]("neighbor_id")).toSeq
        }
      assert(graph === brute, s"nBlocks=$nb mismatch")
    }
  }

  test("ivfIndex assigns every vector exactly one cell, the argmax cell") {
    val index = Similarity.ivfIndex(emb, nCells = 8)
    assert(index.count() === emb.count())
    assert(index.groupBy("vec_id").count().filter($"count" =!= 1).count() === 0)
    // spot-check argmax: recompute best cell by brute force for 5 vectors
    val cents = Similarity.ivfCentroids(emb, nCells = 8)
    val brute = emb.filter($"vec_id" < 5).crossJoin(broadcast(cents))
      .withColumn("s", graft.functions.cosine_sim($"embedding", $"centroid"))
      .groupBy($"vec_id").agg(max(struct($"s", -$"cell_id", $"cell_id")).as("b"))
      .select($"vec_id", $"b.cell_id".as("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = index.filter($"vec_id" < 5)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell_id"))).toMap
    assert(got === brute)
  }

  test("media: image-header synthesis → batched decode parses mime and dimensions back") {
    val media = Media.packMediaImages(docs.limit(21))
    val feats = Media.decodeFeatures(media, batchSize = 7).collect()
    assert(feats.length === 21)
    feats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expMime = (id % 3) match {
        case 0 => "image/png"
        case 1 => "image/jpeg"
        case _ => "image/gif"
      }
      assert(r.getAs[String]("mime") === expMime)
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 576)
      assert(r.getAs[Int]("height") >= 64 && r.getAs[Int]("height") < 576)
      assert(r.getAs[Int]("n_bytes") > 0)
      val mb = r.getAs[Double]("mean_byte")
      assert(mb > 32 && mb < 127) // body = ASCII text payload
    }
    // headerless blobs degrade to octet-stream with whole-payload stats
    val plain = Media.decodeFeatures(Media.packMedia(docs.limit(5))).collect()
    assert(plain.forall(_.getAs[String]("mime") === "application/octet-stream"))
    assert(plain.forall(_.getAs[Int]("width") === 0))
    val frames = Media.sampleFrames(Media.packMedia(docs.limit(20)))
    assert(frames.count() > 0)
    assert(frames.filter(pmod($"frame_idx", lit(4)) =!= 0).count() === 0)
  }

  test("fingerprint: native expression matches a reference FNV-1a") {
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val rows = docs.limit(10)
      .select($"text", graft.functions.poly_fingerprint64($"text").as("fp"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("fp") === fnv(r.getAs[String]("text")))
    }
  }

  test("text stats sanity on real docs") {
    val s = TextAnalysis.stats(docs).collect()
    s.foreach { r =>
      assert(r.getAs[Int]("n_tokens") > 0)
      assert(r.getAs[Double]("quality") >= 0.0 && r.getAs[Double]("quality") <= 1.0)
      assert(r.getAs[String]("lang_pred") != null)
    }
  }
}
