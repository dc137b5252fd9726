package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for LLM-training-data pipelines: token counting,
  * quality scoring, language ID. All pure column expressions
  * (codegen'd, no UDFs, no shuffle) — at 100 TB these run at scan
  * speed as a single projection over the corpus. `stats` tokenizes
  * once and fans every metric out from that array (the regex split is
  * the dominant cost; higher-order functions don't share
  * subexpressions, so the sharing is done structurally).
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word pieces + standalone punctuation, the
    * usual cheap `len(tokenizer(text))` estimator
    * (pattern: word chars | single non-word-non-space).
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Ratio of punctuation chars to all chars. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^.,;:!?'\"]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  private val stopwordsEn = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  private def hitCount(toks: Column, words: Seq[String]): Column = {
    val sw = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t)))
  }

  /** Ratio of stopword tokens to all tokens (toks-sharing variant). */
  def stopwordRatioOf(toks: Column): Column =
    when(size(toks) > 0,
      hitCount(toks, stopwordsEn).cast("double") / size(toks))
      .otherwise(lit(0.0))

  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(text))

  /** Mean word length (non-space chars / token count). */
  def meanWordLenOf(text: Column, toks: Column): Column =
    when(size(toks) > 0,
      length(regexp_replace(text, "\\s", "")).cast("double") / size(toks))
      .otherwise(lit(0.0))

  def meanWordLen(text: Column): Column = meanWordLenOf(text, tokens(text))

  /** Composite quality score in [0,1]: long enough, readable word
    * length, some punctuation, not stopword-soup. The exact recipe is
    * arbitrary (as every corpus quality score is) — what matters is
    * that it's deterministic, cheap, and derived from the standard
    * length/punct/stopword signals.
    */
  def qualityScoreOf(text: Column, toks: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val wordLenOk = when(meanWordLenOf(text, toks).between(3.0, 8.0), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text).between(0.0, 0.2), 1.0).otherwise(0.0)
    val swScore = least(stopwordRatioOf(toks) * lit(5.0), lit(1.0))
    round(lit(0.4) * lenScore + lit(0.2) * wordLenOk +
      lit(0.2) * punctOk + lit(0.2) * swScore, 6)
  }

  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))

  /** Stopword-hit language ID — the classic cheap n-gram/stopword
    * heuristic: score = distinctive-stopword hits per language, CJK by
    * codepoint class, argmax with a fixed precedence. (The synthetic
    * corpus draws from one shared vocabulary, so scores here mostly
    * say "en/unknown" — the operator is the point, and its oracle
    * recomputes the identical heuristic.)
    */
  def langIdOf(text: Column, toks: Column): Column = {
    val en = hitCount(toks, Seq("the", "and", "of", "is", "that"))
    val es = hitCount(toks, Seq("el", "los", "las", "es", "y"))
    val de = hitCount(toks, Seq("der", "die", "das", "und", "ist"))
    val fr = hitCount(toks, Seq("le", "les", "est", "et", "dans"))
    val zh = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    val m = greatest(en, es, de, fr, zh)
    when(m === 0, "unknown")
      .when(en === m, "en").when(es === m, "es").when(de === m, "de")
      .when(fr === m, "fr").otherwise("zh")
  }

  def langId(text: Column): Column = langIdOf(text, tokens(text))

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

  /** Training-mix report: per (source, lang) doc and token counts and
    * mean quality — the corpus-composition summary a data pipeline
    * publishes before choosing mixing weights. One map-side-combined
    * shuffle on the (source, lang) key; quality accumulates in
    * decimal micro-units so the mean is integer-exact and
    * order-independent at any parallelism.
    */
  def corpusMix(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("__toks", tokens(col(textCol)))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("__toks"))).cast("long").as("n_tokens"),
        (sum(qualityScoreOf(col(textCol), col("__toks")).cast("decimal(18,6)"))
          * 1000000).cast("long").as("quality_sum_micro"))
      .withColumn("mean_quality_micro",
        expr("quality_sum_micro div n_docs"))

  /** Full per-document stats frame (single tokenization). */
  def stats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("__toks", tokens(t))
      .select(
        col("doc_id"),
        length(t).as("n_chars"),
        size(col("__toks")).as("n_tokens"),
        bpeishCount(t).as("n_bpeish"),
        meanWordLenOf(t, col("__toks")).as("mean_word_len"),
        punctRatio(t).as("punct_ratio"),
        stopwordRatioOf(col("__toks")).as("stopword_ratio"),
        qualityScoreOf(t, col("__toks")).as("quality"),
        langIdOf(t, col("__toks")).as("lang_pred"))
  }
}
