package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.text_profile

/** Text analysis for LLM-training-data pipelines: token counting,
  * quality scoring, language ID. Every scalar metric derives from the
  * native one-pass TextProfile expression (codegen'd, no UDFs, no
  * shuffle, no intermediate token arrays) — at 100 TB these run at
  * scan speed as a single projection over the corpus. The columnar
  * equivalents (regex split + higher-order list functions) are
  * CodegenFallback in Spark and measured ~3× slower on the corpus
  * scan; `tokens` remains for operators that genuinely need the token
  * ARRAY (chunking, shingling, tf-idf).
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text (array producer — the
    * scalar metrics below don't pay for this array).
    */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** All adjacent token pairs WITH multiplicity (contrast
    * Curation.ngramsOf, which dedups) — the counting unit of a
    * merge-frequency pass (the BPE-trainer inner loop at word grain):
    * corpus-wide pair counts are one explode + one map-side-combined
    * groupBy away.
    *
    * Convenience string form; for the corpus scan use [[bigramPairs]]
    * — the lambda `transform` here is CodegenFallback, and the
    * null/size guards Spark wraps around a downstream explode re-run
    * the interpreted chain per row (measured 6.7 s vs 0.5 s at sf0.1).
    */
  def bigrams(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Adjacent token pairs as a zipped struct array — codegen'd
    * builtins only (slice + arrays_zip, no lambda): the corpus-scan
    * form. Build the pair string AFTER the explode
    * (`concat_ws(" ", p.a, p.b)`), where it is plain per-row codegen.
    */
  def bigramPairs(text: Column): Column = {
    val toks = tokens(text)
    val n = greatest(size(toks) - 1, lit(0))
    arrays_zip(slice(toks, lit(1), n).as("a"), slice(toks, lit(2), n).as("b"))
  }

  /** The one-pass profile struct (see o.a.s.sql.graft.TextProfile).
    * Repeated references inside one projection are collapsed by
    * whole-stage codegen's subexpression elimination, so deriving
    * many metrics from `profile(t)` still scans each row once.
    */
  def profile(text: Column): Column = text_profile(text)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = profile(text).getField("n_tokens")

  /** BPE-ish subword count: word pieces + standalone punctuation, the
    * usual cheap `len(tokenizer(text))` estimator
    * (word-char runs | single non-word-non-space code points).
    */
  def bpeishCount(text: Column): Column = profile(text).getField("n_bpeish")

  /** Ratio of punctuation chars to all chars. */
  def punctRatio(text: Column): Column = punctRatioOfP(profile(text))

  private def punctRatioOfP(p: Column): Column =
    when(p.getField("n_chars") > 0,
      p.getField("n_punct").cast("double") / p.getField("n_chars"))
      .otherwise(lit(0.0))

  /** Ratio of stopword tokens to all tokens. */
  def stopwordRatio(text: Column): Column = stopwordRatioOfP(profile(text))

  private def stopwordRatioOfP(p: Column): Column =
    when(p.getField("n_tokens") > 0,
      p.getField("sw_q").cast("double") / p.getField("n_tokens"))
      .otherwise(lit(0.0))

  /** Mean word length (non-space chars / token count). */
  def meanWordLen(text: Column): Column = meanWordLenOfP(profile(text))

  private def meanWordLenOfP(p: Column): Column =
    when(p.getField("n_tokens") > 0,
      p.getField("n_nonspace").cast("double") / p.getField("n_tokens"))
      .otherwise(lit(0.0))

  /** Composite quality score in [0,1]: long enough, readable word
    * length, some punctuation, not stopword-soup. The exact recipe is
    * arbitrary (as every corpus quality score is) — what matters is
    * that it's deterministic, cheap, and derived from the standard
    * length/punct/stopword signals.
    */
  def qualityScore(text: Column): Column = qualityScoreOfP(profile(text))

  /** Quality score from an already-bound profile struct column. */
  def qualityScoreOfP(p: Column): Column = {
    val lenScore = least(p.getField("n_chars").cast("double") / lit(500.0), lit(1.0))
    val wordLenOk = when(meanWordLenOfP(p).between(3.0, 8.0), 1.0).otherwise(0.0)
    val punctOk = when(punctRatioOfP(p).between(0.0, 0.2), 1.0).otherwise(0.0)
    val swScore = least(stopwordRatioOfP(p) * lit(5.0), lit(1.0))
    round(lit(0.4) * lenScore + lit(0.2) * wordLenOk +
      lit(0.2) * punctOk + lit(0.2) * swScore, 6)
  }

  /** Stopword-hit language ID — the classic cheap n-gram/stopword
    * heuristic: score = distinctive-stopword hits per language, CJK by
    * codepoint class, argmax with a fixed precedence. (The synthetic
    * corpus draws from one shared vocabulary, so scores here mostly
    * say "en/unknown" — the operator is the point, and its oracle
    * recomputes the identical heuristic.)
    */
  def langId(text: Column): Column = langIdOfP(profile(text))

  /** Language ID from an already-bound profile struct column. */
  def langIdOfP(p: Column): Column = {
    val en = p.getField("sw_en"); val es = p.getField("sw_es")
    val de = p.getField("sw_de"); val fr = p.getField("sw_fr")
    val zh = p.getField("n_zh")
    val m = greatest(en, es, de, fr, zh)
    when(m === 0, "unknown")
      .when(en === m, "en").when(es === m, "es").when(de === m, "de")
      .when(fr === m, "fr").otherwise("zh")
  }

  /** Top-k most distinctive terms per document by tf-idf
    * (idf = ln(N/df)). Shuffles only (doc_id, term) count pairs; the
    * document-frequency table is vocabulary-sized and broadcast, so
    * scoring is a map-side join over the tf table.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 3,
                textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = toks.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** Top-k terms per document by BM25 weight — tf-idf's
    * production-retrieval successor: term saturation (k1) and
    * document-length normalization (b), with Lucene's `+1` idf so
    * weights stay positive at any df. Same shuffle shape as
    * [[tfidfTopK]] plus one trick: the document length is a
    * whole-partition window SUM over the tf table, so it rides the
    * doc_id exchange the rank window needs anyway — no extra
    * doc-keyed join. The df table and the 1-row corpus stats frame
    * broadcast; scoring is map-side.
    */
  def bm25TopK(docs: DataFrame, k: Int = 3, k1: Double = 1.2,
               b: Double = 0.75, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    // the tf table feeds THREE branches (scoring, df, corpus stats) —
    // persist it so the tokenize + (doc, term) shuffle runs once, not
    // per branch; released after the first action on the result
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    val withDl = tf.withColumn("dl",
      sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = withDl.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // parenthesization mirrors the oracle SQL exactly — every op is a
    // correctly-rounded IEEE basic op except ln, which q_tfidf's
    // long-green gate shows agrees across engines at micro precision
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val score = idf * (col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("bm25").desc, col("term"))
    LshDedup.unpersistAfterFirstUse(
      withDl.join(broadcast(df), "term")
        .crossJoin(broadcast(stats))
        .withColumn("bm25", score)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
          col("dl"), col("bm25")),
      tf)
  }

  /** Training-mix report: per (source, lang) doc and token counts and
    * mean quality — the corpus-composition summary a data pipeline
    * publishes before choosing mixing weights. One map-side-combined
    * shuffle on the (source, lang) key; quality accumulates in
    * decimal micro-units so the mean is integer-exact and
    * order-independent at any parallelism.
    */
  /** Token co-occurrence (collocation) mining: for the top-`vocabSize`
    * tokens by document frequency, count the documents where each
    * token PAIR co-occurs and score it by lift
    * (P(a,b) / (P(a)·P(b)), the exp-PMI) — emitted in floor-to-micro
    * integer units (c_ab·n_docs·10⁶ div df_a·df_b: pure BIGINT
    * arithmetic, engine-exact, no FP log).
    *
    * Scale design: the vocabulary is a top-k aggregate (tiny) that
    * BROADCASTS back — each document's token set prunes to ≤vocabSize
    * entries before any pair is formed, so pair generation is a
    * bounded slice-explode over the sorted in-vocab set (codegen
    * builtins, the bigramPairs technique — no lambda transform, no
    * doc×doc or token×token join) and pair counts combine map-side.
    * Rows shuffled = in-vocab pairs per doc ≤ vocabSize²/2, not
    * corpus size × vocab.
    */
  def cooccurrence(docs: DataFrame, vocabSize: Int = 50, topK: Int = 50,
                   textCol: String = "text"): DataFrame = {
    val tok = docs.select(col("doc_id"),
      array_distinct(tokens(col(textCol))).as("toks"))
    val docTok = tok.select(col("doc_id"), explode(col("toks")).as("token"))
    val vocab = docTok.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token")).limit(vocabSize)
    // each token's df rides along from the single broadcast join into
    // the collect_set struct — vocab feeds exactly ONE plan branch
    // (Spark re-derives unshared subtrees per branch: the first cut
    // joined df back per pair side and planned THREE vocab corpus
    // scans). Structs sort by leading field, so pair order (a < b) is
    // still the token order.
    val perDoc = docTok
      .join(broadcast(vocab), "token")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(struct(col("token"), col("df")))).as("vt"))
    // ordered pairs (a < b) via posexplode + slice (start is 1-based;
    // keep elements strictly after i)
    val pairs = perDoc
      .select(col("vt"), posexplode(col("vt")).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(col("vt"), col("i") + lit(2), size(col("vt")))).as("b"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    pairs
      .groupBy(col("a.token").as("tok_a"), col("b.token").as("tok_b"),
        col("a.df").as("df_a"), col("b.df").as("df_b"))
      .agg(count(lit(1)).as("c_ab"))
      .crossJoin(broadcast(nDocs))
      // the numerator in DECIMAL(38,0): c_ab·n_docs·10^6 passes 2^63
      // once the corpus passes ~3M docs (c_ab can approach n_docs for
      // top-df pairs) — int64 would wrap silently in Spark and raise
      // in DuckDB; the quotient itself stays ≤ 10^6·n_docs, long-safe
      .withColumn("lift_micro",
        expr("cast(c_ab as decimal(38,0)) * n_docs * 1000000 div " +
          "(cast(df_a as decimal(38,0)) * df_b)"))
      .select(col("tok_a"), col("tok_b"), col("c_ab"),
        col("df_a"), col("df_b"), col("lift_micro"))
      .orderBy(col("c_ab").desc, col("tok_a"), col("tok_b"))
      .limit(topK)
  }

  def corpusMix(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("__p", profile(col(textCol)))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__p.n_tokens")).cast("long").as("n_tokens"),
        (sum(qualityScoreOfP(col("__p")).cast("decimal(18,6)"))
          * 1000000).cast("long").as("quality_sum_micro"))
      .withColumn("mean_quality_micro",
        expr("quality_sum_micro div n_docs"))

  /** CCNet-style fluency proxy: score each document by the mean
    * reference-corpus frequency of its word bigrams (micro units,
    * floor). The production pattern scores a raw corpus against an
    * LM trained on a trusted slice (CCNet/Gopher use KenLM
    * perplexity); the frequency form keeps the statistic pure BIGINT
    * — log-likelihoods are transcendental, so a cross-engine hash
    * gate could disagree in the last ulp, while count arithmetic
    * cannot. A rare/garbled doc scores near 0, fluent text high.
    *
    * Scale shape: the reference LM is ONE bigram-count aggregation
    * (map-side combined); scoring is an equi-join on the bigram key
    * (vocab²-bounded table — broadcast when it fits, shuffle join
    * otherwise; Spark's planner picks by size) and one per-doc
    * rollup. Documents with fewer than two tokens have no bigrams
    * and produce no row — callers treat absence as unscorable.
    * ref_hits·10⁶ goes through DECIMAL like lift_micro: a spam doc
    * whose every bigram is a high-count reference bigram can push
    * the product past int64 at corpus scale.
    */
  def fluencyScore(docs: DataFrame, reference: DataFrame): DataFrame = {
    def docBigrams(df: DataFrame) = df
      .select(col("doc_id"), explode(bigramPairs(col("text"))).as("p"))
      .select(col("doc_id"), concat_ws(" ", col("p.a"), col("p.b")).as("bigram"))
    val refCounts = docBigrams(reference)
      .groupBy(col("bigram")).agg(count(lit(1)).as("ref_n"))
    docBigrams(docs)
      .join(refCounts, Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("ref_n"), lit(0L))).as("ref_hits"))
      .withColumn("fluency_micro",
        expr("cast(ref_hits as decimal(38,0)) * 1000000 div n_bigrams")
          .cast("long"))
      .select(col("doc_id"), col("n_bigrams"), col("fluency_micro"))
  }

  /** Cross-source n-gram overlap matrix — the contamination
    * diagnostic BETWEEN corpus slices (q_decontaminate guards the
    * train/eval boundary; this reports source×source shared-content
    * structure, e.g. a crawl slice that duplicates a curated set).
    * Output: one row per unordered source pair with distinct-gram
    * intersection, union, and integer-exact Jaccard in micro units.
    *
    * Scale shape: ONE corpus-sized shuffle — groupBy(gram) with
    * map-side-combined collect_set(source) (set size bounded by
    * |sources|, dozens); source pairs expand LOCALLY per gram from the
    * sorted set (≤ |sources|²/2 rows per gram), so there is no
    * gram-frame self-join and pair explosion cannot occur. The
    * gram→sources frame is persisted once and feeds both the size
    * table and the intersection counts; source sizes ride a broadcast.
    * (A distinct+self-join formulation measured ~2× this plan's cost
    * at sf0.1 — it reshuffles the gram frame for both join sides.)
    */
  def sourceOverlap(docs: DataFrame, n: Int = 3,
                    textCol: String = "text"): DataFrame = {
    val byGram = docs
      .select(col("source"), explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(array_sort(collect_set(col("source"))).as("srcs"))
      .persist()
    val sizes = byGram.select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    // all (a < b) pairs of the sorted per-gram source set, expanded
    // locally: for element i, pair it with every later element
    val pairs = expr(
      "flatten(transform(srcs, (x, i) -> " +
        "transform(slice(srcs, i + 2, size(srcs)), y -> struct(x AS a, y AS b))))")
    val inter = byGram
      .filter(size(col("srcs")) >= 2)
      .select(explode(pairs).as("p"))
      .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_int"))
    val res = inter
      .join(broadcast(sizes.select(
        col("source").as("source_a"), col("n_grams").as("__na"))), "source_a")
      .join(broadcast(sizes.select(
        col("source").as("source_b"), col("n_grams").as("__nb"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_int"),
        (col("__na") + col("__nb") - col("n_int")).as("n_union"),
        expr("(n_int * 1000000) div (__na + __nb - n_int)").as("jaccard_micro"))
    LshDedup.unpersistAfterFirstUse(res, byGram)
  }

  /** Full per-document stats frame (single profile pass). */
  def stats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("__p", profile(col(textCol)))
      .select(
        col("doc_id"),
        col("__p.n_chars").as("n_chars"),
        col("__p.n_tokens").as("n_tokens"),
        col("__p.n_bpeish").as("n_bpeish"),
        meanWordLenOfP(col("__p")).as("mean_word_len"),
        punctRatioOfP(col("__p")).as("punct_ratio"),
        stopwordRatioOfP(col("__p")).as("stopword_ratio"),
        qualityScoreOfP(col("__p")).as("quality"),
        langIdOfP(col("__p")).as("lang_pred"))
}
