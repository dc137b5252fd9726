package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A true BPE-style merge trainer over tokenized documents — the
  * iterated form of the q_bigrams merge-count step: each round finds
  * the corpus-wide most frequent adjacent pair, then REWRITES every
  * sequence with that pair merged (greedy leftmost, non-overlapping —
  * standard BPE semantics) before the next round counts again.
  *
  * Entirely relational: sequences live as (doc_id, pos, token) rows;
  * adjacency is lead() over (doc, pos); the greedy non-overlap rule
  * for runs of an identical-token pair ("a a a" merges once, not
  * twice) is the odd-parity rank inside each island of consecutive
  * matches; position relabeling is a row_number. No driver-side loop
  * over data (the per-round argmax is a 1-row broadcast), no lambda
  * folds — every step is a window or join DuckDB replays verbatim,
  * so the whole trainer sits under the cross-engine hash gate.
  *
  * Scale: per round = one pair-count shuffle (map-side combined) +
  * windows over the (doc, pos) partitioning the table already has.
  * Token rows only ever shrink.
  */
object Bpe {

  /** Adjacent pair of the current sequence table (doc_id, pos, token).
    */
  private def withNext(t: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    t.withColumn("next", lead(col("token"), 1).over(byDoc))
  }

  /** One merge round: returns (rewritten table, 1-row merge record
    * frame (pair_a, pair_b, pair_n)).
    */
  private def mergeRound(t: DataFrame): (DataFrame, DataFrame) = {
    val paired = withNext(t)
    val top = paired
      .filter(col("next").isNotNull)
      .groupBy(col("token").as("pair_a"), col("next").as("pair_b"))
      .agg(count(lit(1)).as("pair_n"))
      .orderBy(col("pair_n").desc, col("pair_a"), col("pair_b"))
      .limit(1)
    (rewriteWith(paired, top), top)
  }

  /** Rewrite an adjacency-annotated sequence table with ONE merge
    * pair (a 1-row broadcast frame): greedy leftmost non-overlapping,
    * the island/odd-parity rule shared by training and encoding.
    */
  private def rewriteWith(paired: DataFrame, pair: DataFrame): DataFrame = {
    val flagged = paired.crossJoin(broadcast(pair))
      .withColumn("is_match",
        col("token") === col("pair_a") && col("next") === col("pair_b"))
    // islands of consecutive matching positions (only same-token runs
    // can produce them); greedy leftmost = odd rank within the island.
    // r15: the island rank used to be a row_number over a SECOND
    // window keyed (doc_id, island) — an extra exchange + sort per
    // merge round. The rank's parity falls out of the same (doc, pos)
    // window instead: with lnm = the last non-matching position at or
    // before pos (running max over the one window every other step
    // already uses), a match's island started at lnm+1, so its island
    // rank is pos − lnm — odd exactly when (pos − lnm) % 2 = 1. One
    // window spec end to end; rewritten sequences are identical
    // (BpeSpec + both BPE oracles gate it).
    val mByDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // lnm defaults to (first pos − 1) when the doc STARTS inside an
    // island — a running min over the same window, because pos is
    // 0-based in round 1 (posexplode) but 1-based after a rewrite
    // (row_number); a constant default would flip the parity of
    // doc-initial islands in later rounds
    val marked = flagged
      .withColumn("lnm",
        coalesce(max(when(!col("is_match"), col("pos"))).over(mByDoc),
          min(col("pos")).over(mByDoc) - 1))
      .withColumn("do_merge",
        col("is_match") && (col("pos") - col("lnm")) % 2 === 1)
    val prevMerged = lag(col("do_merge"), 1, false).over(mByDoc)
    marked
      .withColumn("drop_row", coalesce(prevMerged, lit(false)))
      .filter(!col("drop_row"))
      .select(col("doc_id"),
        row_number().over(mByDoc).as("pos"),
        when(col("do_merge"), concat(col("pair_a"), lit("+"), col("pair_b")))
          .otherwise(col("token")).as("token"))
  }

  /** Run `rounds` merge rounds over whitespace-tokenized `textCol`;
    * returns one row per round: (round, pair_a, pair_b, pair_n).
    */
  def trainMerges(docs: DataFrame, rounds: Int = 3,
                  textCol: String = "text"): DataFrame = {
    require(rounds >= 1)
    // each round's table feeds TWO branches (the pair count and the
    // rewrite) and the next round builds on the rewrite — without a
    // persist per round the unshared subtrees double every round
    // (2^rounds base scans). Caches are token-row-sized and shrink;
    // all released after the first action on the result.
    var t = docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
      .persist()
    val cached = scala.collection.mutable.ListBuffer(t)
    var out: DataFrame = null
    for (round <- 1 to rounds) {
      val (next, top) = mergeRound(t)
      val rec = top.select(lit(round).as("round"),
        col("pair_a"), col("pair_b"), col("pair_n"))
      out = if (out == null) rec else out.unionByName(rec)
      if (round < rounds) { t = next.persist(); cached += t }
    }
    cached.foldLeft(out.orderBy(col("round")))(
      (r, c) => LshDedup.unpersistAfterFirstUse(r, c))
  }

  /** ENCODE with a trained merge list: apply `rounds` merges (in
    * training order) to `docs`, returning the rewritten sequence
    * table (doc_id, pos, token) — the tokenizer-application half of
    * the BPE story (train on the trusted split, encode everything).
    * Each round's pair is a 1-row broadcast filter of `merges`
    * (trainMerges output) — no driver-side data loop, no collect;
    * the same island/odd-parity greedy rewrite as training, so
    * encoding a corpus with merges trained ON it reproduces the
    * trainer's final state exactly. Per-round persist for the same
    * plan-doubling reason as [[trainMerges]].
    */
  def applyMerges(docs: DataFrame, merges: DataFrame, rounds: Int = 3,
                  textCol: String = "text"): DataFrame = {
    require(rounds >= 1)
    var t = docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
      .persist()
    val cached = scala.collection.mutable.ListBuffer(t)
    for (round <- 1 to rounds) {
      val pair = merges.filter(col("round") === round)
        .select(col("pair_a"), col("pair_b"))
      val next = rewriteWith(withNext(t), pair)
      if (round < rounds) { t = next.persist(); cached += t } else t = next
    }
    cached.foldLeft(t)(
      (r, c) => LshDedup.unpersistAfterFirstUse(r, c))
  }
}
