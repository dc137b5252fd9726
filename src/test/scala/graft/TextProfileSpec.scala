package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** The native one-pass TextProfile expression must agree with the
  * columnar formulation it replaced (regex split + higher-order list
  * functions) — checked metric by metric on the real corpus plus
  * constructed edge cases.
  */
class TextProfileSpec extends SparkSpec {
  import spark.implicits._

  private def columnarChecks(df: org.apache.spark.sql.DataFrame): Unit = {
    val toks = filter(split(lower(trim($"text")), "\\s+"), t => length(t) > 0)
    val sw = array(Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that").map(lit): _*)
    val ref = df.select(
      $"text",
      length($"text").as("r_chars"),
      size(toks).as("r_tokens"),
      size(regexp_extract_all($"text", lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))
        .as("r_bpeish"),
      length(regexp_replace($"text", "\\s", "")).as("r_nonspace"),
      length(regexp_replace($"text", "[^.,;:!?'\"]", "")).as("r_punct"),
      length(regexp_replace($"text", "[^\\u4e00-\\u9fff]", "")).as("r_zh"),
      size(filter(toks, t => array_contains(sw, t))).as("r_swq"))
    val got = ref.withColumn("p", TextAnalysis.profile($"text"))
    val bad = got.filter(
      $"p.n_chars" =!= $"r_chars" || $"p.n_tokens" =!= $"r_tokens" ||
        $"p.n_bpeish" =!= $"r_bpeish" || $"p.n_nonspace" =!= $"r_nonspace" ||
        $"p.n_punct" =!= $"r_punct" || $"p.n_zh" =!= $"r_zh" ||
        $"p.sw_q" =!= $"r_swq")
    val mismatches = bad.select($"text", $"p", $"r_chars", $"r_tokens",
      $"r_bpeish", $"r_nonspace", $"r_punct", $"r_zh", $"r_swq").take(3)
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }

  test("profile == columnar formulation on the real corpus") {
    columnarChecks(Tables.documents(spark, "/root/testdata/sf0.001"))
  }

  test("profile == columnar formulation on edge cases") {
    val edges = Seq(
      "",
      "   ",
      "\t\n\r\f",
      "the THE The tHe",
      "one-token",
      "a",
      "y el los las es und der die das le les est et dans ist",
      "punct.,;:!?'\"soup",
      "под водой текст",                 // cyrillic (2-byte UTF-8)
      "中文文本 在 这里",                  // CJK + spaces
      "mixed 中文 and ascii the of",
      "trailing space ",
      " leading",
      "__under_score__ 12numbers34",
      "a b",                        // NBSP is NOT Java \s — one token
      "über naïve café")                 // latin-1 supplement
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    columnarChecks(edges)

    // language ID and quality agree with the struct-derived path
    val both = edges.select(
      TextAnalysis.langId($"text").as("l1"),
      TextAnalysis.langIdOfP(TextAnalysis.profile($"text")).as("l2"),
      TextAnalysis.qualityScore($"text").as("q1"),
      TextAnalysis.qualityScoreOfP(TextAnalysis.profile($"text")).as("q2"))
    assert(both.filter($"l1" =!= $"l2" || $"q1" =!= $"q2").count() === 0)
  }

  test("bigrams keep multiplicity and ordering; short docs yield none") {
    val d = Seq((1L, "a b a b a"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val got = d.select($"doc_id", TextAnalysis.bigrams($"text").as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("a b", "b a", "a b", "b a")) // dups preserved
    assert(got(2L) === Seq.empty && got(3L) === Seq.empty)
    // the codegen scan form produces the identical pair stream
    val viaPairs = d
      .select($"doc_id", explode(TextAnalysis.bigramPairs($"text")).as("p"))
      .select($"doc_id", concat_ws(" ", $"p.a", $"p.b").as("bg"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).toSeq }
    assert(viaPairs.getOrElse(1L, Seq.empty) === got(1L))
    assert(!viaPairs.contains(2L) && !viaPairs.contains(3L))
  }

  test("fluencyScore: hand-computed reference-frequency means; unscorable docs absent") {
    val ref = Seq((100L, "the cat sat"), (101L, "the cat ran"))
      .toDF("doc_id", "text")
    // ref bigram counts: "the cat"=2, "cat sat"=1, "cat ran"=1
    val docs = Seq(
      (1L, "the cat sat"),      // (2 + 1) * 1e6 / 2 = 1500000
      (2L, "zz qq"),            // 0 ref hits -> 0
      (3L, "the cat"),          // 2 * 1e6 / 1 = 2000000
      (4L, "solo"))             // no bigrams -> no row
      .toDF("doc_id", "text")
    val got = TextAnalysis.fluencyScore(docs, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      1L -> (2L, 1500000L),
      2L -> (1L, 0L),
      3L -> (1L, 2000000L)))
  }

  test("bm25TopK: saturation, length normalization, idf ordering") {
    // 4 docs; "rare" appears in one doc, "common" in all
    val docs = Seq(
      (1L, "common rare alpha beta"),
      (2L, "common common common common gamma"),
      (3L, "common delta epsilon zeta eta theta iota kappa " +
        "lam mu nu xi omicron pi rho sigma tau"),
      (4L, "common alpha")).toDF("doc_id", "text")
    val all = TextAnalysis.bm25TopK(docs, k = 100).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("bm25")))
      .toMap
    // idf ordering: in doc 1 (all tf=1, same dl) rare > common
    assert(all((1L, "rare"))._3 > all((1L, "common"))._3)
    // saturation: tf=4 in doc 2 scores less than 4x a tf=1 score
    // would (compare against doc 4's common at a shorter dl — even
    // with the shorter-doc advantage, 4x caps it)
    assert(all((2L, "common"))._3 < 4 * all((4L, "common"))._3)
    // length normalization: same term, same tf=1 — the 18-token doc
    // scores lower than the 2-token doc
    assert(all((3L, "common"))._3 < all((4L, "common"))._3)
    // rank column: doc 1's top term is a df=1 term ("beta" and "rare"
    // tie on score — same tf/df/dl — and the tie breaks alphabetically)
    val top = TextAnalysis.bm25TopK(docs, k = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    assert(top(1L) === "beta")
  }
}
