package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def report(docs: Seq[(Long, String)], n: Int = 8): Map[Long, (Long, Long, Long)] =
    Dedup.duplicateSpans(docs.toDF("doc_id", "text"), n = n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("a shared 8-token run marks exactly its covering positions in both docs") {
    val out = report(Seq(
      0L -> "a b c d e f g h x y z",   // run at pos 0, 11 tokens
      1L -> "a b c d e f g h p q",     // same run at pos 0, 10 tokens
      2L -> "one two three four five six seven eight nine"  // unique
    ))
    assert(out(0L) === ((11L, 1L, 8L)))
    assert(out(1L) === ((10L, 1L, 8L)))
    assert(out(2L) === ((9L, 0L, 0L)))
  }

  test("repetition WITHIN one document is duplication too") {
    val out = report(Seq(
      0L -> "r s t u v w x y r s t u v w x y"))  // 16 tokens, run repeats at pos 0 and 8
    // grams at pos 0 and pos 8 hash equal (count 2); the 7 boundary-
    // spanning grams are unique
    assert(out(0L) === ((16L, 2L, 16L)))
  }

  test("overlapping duplicated grams count distinct covered positions, not 8 each") {
    val nine = (1 to 9).map(i => s"m$i").mkString(" ")
    val out = report(Seq(0L -> nine, 1L -> s"z1 $nine"))
    // each doc holds 2 duplicated gram starts whose spans overlap in 9 positions
    assert(out(0L) === ((9L, 2L, 9L)))
    assert(out(1L) === ((10L, 2L, 9L)))
  }

  test("docs shorter than the gram width report zeros, not vanish") {
    val out = report(Seq(0L -> "k l m", 1L -> "k l m"))
    assert(out(0L) === ((3L, 0L, 0L)))
    assert(out(1L) === ((3L, 0L, 0L)))
  }

  private def cutReport(docs: Seq[(Long, String)], n: Int = 8): Map[Long, (Long, Long, String)] =
    Dedup.cutDuplicateSpans(docs.toDF("doc_id", "text"), n = n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("cut keeps the first corpus-wide occurrence and cuts the later one") {
    val out = cutReport(Seq(
      0L -> "a b c d e f g h x y z",
      1L -> "a b c d e f g h p q"))
    assert(out(0L) === ((11L, 11L, "a b c d e f g h x y z")))
    assert(out(1L) === ((10L, 2L, "p q")))
  }

  test("internal repetition keeps the first span, cuts the echo") {
    val out = cutReport(Seq(0L -> "r s t u v w x y r s t u v w x y"))
    assert(out(0L) === ((16L, 8L, "r s t u v w x y")))
  }

  test("a fully-duplicated document is cut to empty, not dropped") {
    val out = cutReport(Seq(
      0L -> "a b c d e f g h",
      1L -> "a b c d e f g h"))
    assert(out(0L) === ((8L, 8L, "a b c d e f g h")))
    assert(out(1L) === ((8L, 0L, "")))
  }

  test("overlapping later spans cut their union; the first doc is untouched") {
    val nine = (1 to 9).map(i => s"m$i").mkString(" ")
    val out = cutReport(Seq(0L -> nine, 1L -> s"z1 $nine"))
    assert(out(0L) === ((9L, 9L, nine)))
    assert(out(1L) === ((10L, 1L, "z1")))
  }

  test("hash-gram report equals a string-gram brute force on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 60).select($"doc_id", $"text")
    val n = 8
    // positional STRING 8-grams (no hashing): the semantic ground truth
    val toks = docs.select($"doc_id",
      filter(split(lower(trim($"text")), "\\s+"), t => length(t) > 0).as("tk"))
    val grams = toks
      .filter(size($"tk") >= n)
      .select($"doc_id", explode(
        transform(sequence(lit(0), size($"tk") - n),
          i => struct(i.as("pos"),
            array_join(slice($"tk", i + 1, lit(n)), " ").as("g")))).as("pg"))
      .select($"doc_id", $"pg.pos".as("pos"), $"pg.g".as("g"))
    val dup = grams.groupBy($"g").count().filter($"count" > 1).select($"g")
    val occ = grams.join(dup, "g")
    val truth = toks.select($"doc_id", size($"tk").cast("long").as("n_tokens"))
      .join(occ.groupBy($"doc_id").agg(count(lit(1)).as("n_dup_grams")),
        Seq("doc_id"), "left")
      .join(occ.select($"doc_id",
          explode(sequence($"pos", $"pos" + lit(n - 1))).as("p"))
        .groupBy($"doc_id").agg(count_distinct($"p").as("n_dup_tokens")),
        Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"n_dup_grams", lit(0L)).as("n_dup_grams"),
        coalesce($"n_dup_tokens", lit(0L)).as("n_dup_tokens"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = Dedup.duplicateSpans(docs, n = n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === truth)
    // and the corpus genuinely exercises the dup path
    assert(got.values.exists(_._2 > 0L), "sample must contain duplicated spans")
  }
}
