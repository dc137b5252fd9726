package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Collocation mining: the bounded slice-explode pair path must equal
  * the naive doc×doc-free formulation (explode + self-join per doc).
  */
class CooccurSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrence equals the naive pair join on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextAnalysis.cooccurrence(docs, vocabSize = 20, topK = 30)
      .collect().map(_.toSeq)

    val dt = docs.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("token"))
    val vocab = dt.groupBy($"token").agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"token").limit(20)
    val dv = dt.join(vocab, "token").select($"doc_id", $"token", $"df")
    val nDocs = docs.count()
    val want = dv.as("a").join(dv.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.token") < col("b.token"))
      .groupBy(col("a.token").as("tok_a"), col("b.token").as("tok_b"),
        col("a.df").as("df_a"), col("b.df").as("df_b"))
      .agg(count(lit(1)).as("c_ab"))
      .withColumn("lift_micro",
        expr(s"c_ab * $nDocs * 1000000 div (df_a * df_b)"))
      .select($"tok_a", $"tok_b", $"c_ab", $"df_a", $"df_b", $"lift_micro")
      .orderBy($"c_ab".desc, $"tok_a", $"tok_b").limit(30)
      .collect().map(_.toSeq)

    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
    // lift sanity: co-occurrence count never exceeds either df
    got.foreach { r =>
      val (cab, dfa, dfb) = (r(2).asInstanceOf[Long],
        r(3).asInstanceOf[Long], r(4).asInstanceOf[Long])
      assert(cab <= dfa && cab <= dfb)
    }
  }
}
