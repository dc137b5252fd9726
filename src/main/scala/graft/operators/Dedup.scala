package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines.
  *
  * Scale design: exact dedup is one hash-groupBy shuffle (the hash —
  * 16 bytes — shuffles, never the document bodies). Near-dup
  * (MinHash/SimHash, see LshDedup) turns the O(n²) pair space into
  * band-bucket shuffles.
  */
object Dedup {

  /** Canonical text form for exact matching: lowercase, trim, collapse
    * runs of whitespace.
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Content hash of the normalized text (md5: stable across engines,
    * collision-safe enough for dedup bucketing at corpus scale).
    */
  def contentHash(text: Column): Column = md5(normalized(text))

  /** One row per distinct content: the keeper (min doc_id) and the
    * duplicate count. Shuffles only (hash, doc_id) pairs.
    */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(contentHash(col(textCol)).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated corpus: keeps the min-doc_id row of each
    * content group. Window-free formulation would use a semi-join on
    * exactGroups; the window form keeps it one shuffle.
    */
  def dropExactDuplicates(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(contentHash(col(textCol))).orderBy(col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Incremental exact dedup — the daily-ingest pattern: admit only
    * new-batch documents whose content is unseen. Two rules, in
    * order: one keeper per content group WITHIN the batch (min
    * doc_id, with the group's copy count kept as observability), then
    * drop keepers whose content hash already exists in the corpus
    * (left-anti join).
    *
    * Scale: the corpus side is projected to its 16-byte content hash
    * before the anti-join, so column pruning reaches the corpus scan
    * and only hashes ever shuffle — at 100 TB this is a shuffle anti
    * join of hash against hash, never document bodies. In a real
    * pipeline the corpus hash table is maintained incrementally
    * (exactGroups output persisted per ingest); pass such a frame
    * directly — any `corpus` that already has a `content_hash` column
    * is used as-is, skipping the re-scan.
    */
  def incrementalExact(corpus: DataFrame, batch: DataFrame,
                       textCol: String = "text"): DataFrame = {
    val corpusHashes =
      if (corpus.columns.contains("content_hash")) corpus.select("content_hash")
      else corpus.select(contentHash(col(textCol)).as("content_hash"))
    val wOrd = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val wAll = Window.partitionBy(col("content_hash"))
    batch
      .withColumn("content_hash", contentHash(col(textCol)))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("n_batch_copies", count(lit(1)).over(wAll))
      .filter(col("__rn") === 1).drop("__rn")
      .join(corpusHashes, Seq("content_hash"), "left_anti")
  }

  /** Streaming exact dedup: drop any document whose normalized
    * content hash was already seen within the watermark horizon —
    * ingest-time dedup for a document stream. State is one hash per
    * distinct document bounded by the watermark (Spark expires state
    * past it); the batch operators above remain the full-corpus pass.
    */
  def dropExactDuplicatesStream(docs: DataFrame, tsCol: String,
                                watermark: String,
                                textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", contentHash(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** End-to-end corpus dedup: exact (hash groups) then near-dup
    * (MinHash LSH → Jaccard-verified pairs → connected components),
    * keeping one representative per duplicate cluster.
    */
  def dedupCorpus(docs: DataFrame, jaccardThreshold: Double = 0.8,
                  textCol: String = "text"): DataFrame = {
    // r15: `exact` feeds both the pair miner and the final anti-join —
    // without a persist the text scan + content-hash window executed
    // once per consumer (and a third time for the miner's scale-guard
    // count in the exact variant). Survivor-doc-sized cache, released
    // after the first action (LshDedup caching contract).
    val exact = dropExactDuplicates(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = LshDedup.jaccardVerified(exact, jaccardThreshold, n = 3)
      .select(col("doc_a"), col("doc_b"))
    LshDedup.unpersistAfterFirstUse(dropNearDuplicates(exact, pairs), exact)
  }

  /** The fully-deterministic variant of [[dedupCorpus]]: near-dup
    * pairs come from the EXACT inverted-index set-similarity join
    * instead of LSH banding, so the surviving set is a pure function
    * of the corpus (no recall caveat — which is what lets a DuckDB
    * oracle check the whole pipeline end-to-end). Same stages
    * otherwise: exact content dedup → near-dup pairs → connected
    * components → one representative (min doc_id) per cluster. LSH
    * banding in dedupCorpus buys sub-quadratic candidate generation
    * at corpus scale; this path's cost is the set-similarity join
    * (still bucketed by shingle, never all-pairs).
    */
  def dedupCorpusExact(docs: DataFrame, jaccardThreshold: Double = 0.8,
                       textCol: String = "text",
                       maxExactRows: Long = ExactScale.DefaultMaxExactRows,
                       force: Boolean = false): DataFrame = {
    // same three-consumer persist rationale as [[dedupCorpus]] (r15)
    val exact = dropExactDuplicates(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = LshDedup.exactJaccardPairs(exact, jaccardThreshold,
        maxExactRows = maxExactRows, force = force)
      .select(col("doc_a"), col("doc_b"))
    LshDedup.unpersistAfterFirstUse(dropNearDuplicates(exact, pairs), exact)
  }

  /** Word n-gram shingles (distinct) — the unit set for Jaccard /
    * MinHash.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    // r15: the old transform(sequence) form sliced `toks` INSIDE the
    // lambda — and higher-order functions re-evaluate captured
    // subtrees per element, so the whole tokenizer (trim+lower+split+
    // filter) re-ran once per gram POSITION: O(tokens²) regex work
    // per doc (measured: the explode of these shingles alone cost
    // 4.8 s at sf0.1; the zipped form below is ~0.3 s). Build the
    // grams instead from n top-level shifted slices zipped
    // element-wise: every reference to `toks` is per-ROW (and
    // subexpression-eliminated), the lambdas only concat elements.
    // Output is identical: gram i = toks[i..i+n-1] joined by ' '.
    val len = size(toks) - (n - 1) // ≥ 1 whenever the guard passes
    val grams = (1 to n).map(k => slice(toks, lit(k), len))
      .reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    // guard: slice(toks, k, non-positive) would throw — `when` only
    // evaluates the taken branch, so short docs never build grams
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** Connected components over near-duplicate pairs — the final step
    * of corpus dedup: pairs (a,b) form a graph; every doc gets the
    * minimum doc_id reachable from it as its cluster id, and one doc
    * per cluster survives.
    *
    * Algorithm: the large-star / small-star alternation (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14).
    * Each pass rewrites the edge set toward star graphs rooted at
    * component minima; the alternation provably converges in
    * O(log² n) rounds (≈log n in practice) REGARDLESS of how labels
    * are laid out along the topology. (The previous propagate-min +
    * pointer-jump formulation was O(rounds) on adversarial id
    * permutations — a scrambled-id path stalled it; the star
    * transforms carry no such dependence, see DedupPipelineSpec's
    * 1000-node scrambled path.) Every step is a window-min over the
    * edge frame plus an edge distinct — two keyed shuffles of the
    * edge list per star, no join, no driver data (r15 rewrite; the
    * groupBy+join form shuffled the edges a third time per star).
    *
    * Lineage is cut per round (localCheckpoint); on a cluster with
    * executor-loss concerns swap for reliable checkpoint() — same
    * algorithm. Iteration stops at the exact fixpoint (edge set
    * unchanged, verified by anti-join, not a hash signature) and a
    * non-fixpoint exit fails loud: silent stop = wrong cluster ids =
    * several representatives per cluster.
    */
  // r15: both stars were groupBy(min) + re-join — the edge list
  // crossed an exchange TWICE per star (once partially-aggregated,
  // once whole for the join). An unordered window min over the same
  // key computes the neighborhood minimum in ONE edge exchange and
  // no join (guide §2.4: two operations keyed the same way share
  // one exchange); the trailing distinct() is unchanged. Edge sets
  // produced are identical (DedupSpec + the CC oracles gate it).
  // Hoisted to private[graft] so PlanDump/tests can capture one star
  // round's plan (the loop materializes eagerly; the query-level
  // explain only ever shows the final label join).

  /** One large-star pass: every node u links each LARGER neighbor to
    * the min of its neighborhood (including u) — long chains fold onto
    * small ids from both directions.
    */
  private[graft] def largeStar(e: DataFrame): DataFrame =
    largeStarRaw(e).distinct()

  /** [[largeStar]] without the trailing distinct — the form the star
    * ROUND composes (r16): duplicates in large-star output cannot
    * change small-star's window minima, and the round's final
    * distinct (inside [[smallStar]]) collapses them anyway, so the
    * intermediate distinct was one whole exchange + two hash
    * aggregates of the edge list per round for nothing. Kept public
    * largeStar deduped (its standalone contract and tests).
    */
  private[graft] def largeStarRaw(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    b.withColumn("m",
        least(min(col("dst")).over(Window.partitionBy(col("src"))), col("src")))
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** One small-star pass: every node links its SMALLER neighbors (and
    * itself) to their minimum — stars flatten to point at the root.
    * The (src, m) self row is emitted per edge rather than per group
    * (the window has no cheap once-per-group marker without adding a
    * sort); duplicates die in the distinct()'s map-side partial
    * aggregate, where the window sort has already colocated them.
    */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = e.select(greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    o.withColumn("m", min(col("dst")).over(Window.partitionBy(col("src"))))
      .select(explode(array(
        struct(col("dst").as("v"), col("m").as("m")),
        struct(col("src").as("v"), col("m").as("m")))).as("p"))
      .select(col("p.v").as("src"), col("p.m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // capture the node set BEFORE the self-loop filter: a doc whose
    // only pair is (d, d) is a singleton component and must still get
    // a label row (itself), not vanish from the output
    val nodes = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
      .localCheckpoint()
    var edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var converged = false
    var iter = 0
    // r16: the previous round's count is remembered (one action per
    // round, not two — edges is already materialized) and the star
    // round composes largeStarRaw so the only distinct per round is
    // smallStar's (3 edge exchanges per round instead of 4)
    var prevCount = edges.count()
    // per-round localCheckpoint blocks are freed by the ContextCleaner
    // once the previous round's Dataset becomes unreachable (an
    // explicit unpersist() would be a no-op: checkpoint blocks are not
    // CacheManager entries) — peak storage is ~2 rounds of edges
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStarRaw(edges)).localCheckpoint()
      val nextCount = next.count()
      converged = nextCount == prevCount &&
        next.join(edges, Seq("src", "dst"), "left_anti").limit(1).count() == 0
      edges = next
      prevCount = nextCount
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds; " +
          "star alternation needs ~log2 rounds — raise maxIter")
    // fixpoint = stars: every edge is (child, root) with child > root;
    // roots (and isolated nodes) label themselves
    val lbl = edges.groupBy(col("src").as("doc_id"))
      .agg(min(col("dst")).as("cluster_id"))
    nodes.join(lbl, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Incremental connected components: fold new near-dup pairs into
    * an existing cluster assignment without revisiting the original
    * pair set. The assignment's (doc_id, cluster_id) rows are exactly
    * the fixpoint star edges, which preserve all original
    * connectivity — so CC over (assignments ∪ newPairs) equals CC
    * over (originalPairs ∪ newPairs), including the min-id cluster
    * labels. Work scales with |assignments| + |newPairs| edges, never
    * the original pair volume, and the star-shaped input re-converges
    * in ~1-2 alternations when the new pairs touch few clusters.
    * (Pair MINING incrementality is [[BandStore]]'s job; this is the
    * assignment-merge half of incremental near-dup maintenance.)
    */
  def incrementalComponents(assignments: DataFrame, newPairs: DataFrame,
                            maxIter: Int = 50): DataFrame =
    connectedComponents(
      assignments.select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
        .unionByName(newPairs.select(col("doc_a"), col("doc_b"))),
      maxIter)

  /** Drop every near-duplicate except the min-doc_id representative of
    * each connected component. `pairs` comes from LshDedup
    * (jaccardVerified / simhashCandidates) or Similarity
    * (cosineNearDupPairs).
    */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Exact duplicated-substring report (the span-level sibling of
    * document dedup — Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499 §4.1, scaled down from
    * suffix arrays to fixed n-token grams): every n-token gram that
    * occurs more than once ANYWHERE in the corpus (across documents or
    * repeated within one) marks all token positions it covers as
    * duplicated. Output, one row per document: `n_tokens`,
    * `n_dup_grams` (duplicated gram occurrences starting in the doc),
    * `n_dup_tokens` (distinct token positions covered) — the
    * memorization-risk signal a span-cut pass would consume.
    *
    * Scale: the tokenize + shingle front is the codegen'd
    * `token_fnv_hashes` → `shingle_hashes_pos` scan stage; only 8-byte
    * gram hashes ever shuffle. The duplicated-hash set is a
    * map-side-combined groupBy whose count=1 tail (the overwhelming
    * majority of grams, Zipf) dies in the partial aggregate; the join
    * back is hash-equi on the surviving dup hashes. Positions explode
    * only for dup occurrences (× n, bounded), never the full corpus.
    */
  def duplicateSpans(docs: DataFrame, textCol: String = "text",
                     n: Int = 8): DataFrame = {
    import graft.functions.{shingle_hashes_pos, token_fnv_hashes}
    val toks = docs.select(col("doc_id"),
      token_fnv_hashes(lower(trim(col(textCol)))).as("tkh"))
    val grams = toks.select(col("doc_id"),
      posexplode(shingle_hashes_pos(col("tkh"), n)).as(Seq("pos", "h")))
    val dupHashes = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .select(col("h"))
    val dupOcc = grams.join(dupHashes, "h")
    val perDocGrams = dupOcc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_grams"))
    val perDocTokens = dupOcc
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tpos"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("tpos")).as("n_dup_tokens"))
    toks.select(col("doc_id"), size(col("tkh")).cast("long").as("n_tokens"))
      .join(perDocGrams, Seq("doc_id"), "left")
      .join(perDocTokens, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"))
  }

  /** The destructive half of [[duplicateSpans]] — ExactSubstr dedup
    * (Lee et al. 2021 §4.1) end-to-end: for every duplicated n-token
    * gram, the FIRST occurrence corpus-wide (min (doc_id, pos)) is
    * kept; every later occurrence's span is cut, and each document is
    * reassembled from its surviving tokens. Output per doc:
    * `n_tokens`, `n_tokens_kept`, and the rebuilt `text_kept`
    * (whitespace-normalized by construction).
    *
    * Scale: ranking occurrences within a gram-hash group shuffles only
    * the DUPLICATED occurrences (tiny vs the corpus) keyed by hash;
    * the reassembly is one per-doc shuffle of (pos, token) pairs —
    * the same key the tokenize stage already carries. A kept first
    * occurrence can still lose tokens to a different overlapping cut
    * span; that is the defined semantics (cut spans are cut), matching
    * the reference implementation's suffix-interval behavior.
    */
  def cutDuplicateSpans(docs: DataFrame, textCol: String = "text",
                        n: Int = 8): DataFrame = {
    import graft.functions.{shingle_hashes_pos, token_fnv_hashes}
    val toks = docs.select(col("doc_id"),
      filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0).as("tk"))
    val grams = docs.select(col("doc_id"),
      posexplode(shingle_hashes_pos(
        token_fnv_hashes(lower(trim(col(textCol)))), n)).as(Seq("pos", "h")))
    // duplicated hashes via map-side-combined groupBy (the count=1
    // tail never shuffles), THEN rank only the surviving occurrences —
    // a window straight over `grams` would shuffle the whole gram
    // table with no partial aggregation
    val dupHashes = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .select(col("h"))
    val wOcc = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("pos"))
    val cut = grams.join(dupHashes, "h")
      .withColumn("rk", row_number().over(wOcc))
      .filter(col("rk") > 1)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tpos"))
      .distinct()
    val kept = toks
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("tpos", "tok")))
      .join(cut, Seq("doc_id", "tpos"), "left_anti")
    toks.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens_kept"),
          array_join(array_sort(collect_list(struct(col("tpos"), col("tok"))))
            .getField("tok"), " ").as("text_kept")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** Exact n-gram Jaccard similarity between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) > 0,
      size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))
      .otherwise(lit(0.0))
}
