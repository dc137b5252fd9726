package graft

import graft.operators.Bpe

/** BPE merge trainer semantics: corpus-wide top pair per round,
  * greedy leftmost non-overlapping rewrite (a run "a a a" merges
  * once), deterministic (count desc, pair asc) tiebreak.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("three rounds: top-pair choice, run greedy, tiebreak — hand-computed") {
    val docs = Seq(
      (1L, "x y x y x y"),
      (2L, "a a a")
    ).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (x,y)=3 beats (a,a)=2 → doc1 becomes [x+y, x+y, x+y]
    // round 2: (x+y,x+y)=2 ties (a,a)=2 → 'a' < 'x+y' picks (a,a);
    //          greedy run rewrite: [a,a,a] → [a+a, a] (ONE merge)
    // round 3: (x+y,x+y)=2 beats (a+a,a)=1
    assert(got.toSeq === Seq(
      (1, "x", "y", 3L),
      (2, "a", "a", 2L),
      (3, "x+y", "x+y", 2L)))
  }

  test("long same-token run merges every other pair in one round") {
    val docs = Seq((1L, "b b b b b b")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (b,b)=5 → greedy over the 6-run: [b+b, b+b, b+b]
    // round 2: (b+b,b+b)=2
    assert(got.toSeq === Seq(
      (1, "b", "b", 5L),
      (2, "b+b", "b+b", 2L)))
  }

  test("applyMerges: trained pairs encode new text, not re-counted ones") {
    val train = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(train, rounds = 3)
    // rounds on train: (x,y) → (x+y,x+y) → (x+y+x+y,z)
    def encode(text: String) =
      Bpe.applyMerges(Seq((9L, text)).toDF("doc_id", "text"), merges, rounds = 3)
        .orderBy("pos").collect().map(_.getAs[String]("token")).toSeq
    // self-encode reproduces the trainer's final state
    assert(encode("x y x y z") === Seq("x+y+x+y+z"))
    // new text only merges where trained pairs match — (y,q) was
    // never trained, so it survives even though it is the most
    // frequent pair HERE (proves pairs are applied, not re-counted)
    assert(encode("x y q y q y q") === Seq("x+y", "q", "y", "q", "y", "q"))
    // greedy leftmost non-overlap on a trained same-token run
    val runTrain = Seq((1L, "b b b")).toDF("doc_id", "text")
    val runMerges = Bpe.trainMerges(runTrain, rounds = 1)
    val enc = Bpe.applyMerges(Seq((9L, "b b b b b")).toDF("doc_id", "text"),
      runMerges, rounds = 1)
      .orderBy("pos").collect().map(_.getAs[String]("token")).toSeq
    assert(enc === Seq("b+b", "b+b", "b"))
  }
}
