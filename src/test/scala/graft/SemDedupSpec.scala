package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

class SemDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("semDedup matches a brute-force within-cell replay") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.semDedup(emb, nCells = 16, threshold = 0.35)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    // independent replay: same assignment, then per-vector max cosine
    // to earlier in-cell members computed driver-side
    val asg = Similarity.ivfAssign(emb, Similarity.ivfCentroids(emb, 16))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getLong(r.fieldIndex("cell_id")),
        r.getSeq[Float](r.fieldIndex("embedding"))))
    assert(out.size == asg.length)
    val byCell = asg.groupBy(_._2)
    var dropped = 0
    byCell.values.foreach { members =>
      val sorted = members.sortBy(_._1)
      sorted.zipWithIndex.foreach { case ((vid, cell, e), i) =>
        val priors = sorted.take(i)
        val mp = if (priors.isEmpty) None
                 else Some(priors.map(p => cosine(e, p._3)).max)
        val (gotCell, gotMicro, gotKept) = out(vid)
        assert(gotCell == cell)
        assert(gotMicro == mp.map(m => math.floor(m * 1e6).toLong).getOrElse(-1L),
          s"vec $vid max-prior mismatch")
        assert(gotKept == mp.forall(_ <= 0.35), s"vec $vid keep verdict mismatch")
        if (!gotKept) dropped += 1
      }
    }
    assert(dropped > 0, "threshold must actually drop vectors at this SF")
  }

  test("semDedup is deterministic across partitionings") {
    val emb = Tables.embeddings(spark, sf)
    val a = Similarity.semDedup(emb, 16, 0.35).collect().toSeq
    val b = Similarity.semDedup(emb.repartition(7), 16, 0.35)
      .collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }

  test("the within-cell self-join is an equi-join, not a cartesian product") {
    val plan = Similarity.semDedup(Tables.embeddings(spark, sf), 16, 0.35)
      .queryExecution.optimizedPlan.toString
    // the only non-equi join allowed is the 16-row broadcast centroid
    // cross join feeding the argmax assignment
    assert(!plan.contains("CartesianProduct"))
    val innerJoins = plan.linesIterator.count(l =>
      l.contains("Join Inner") && l.contains("cell_id"))
    assert(innerJoins >= 1, s"expected an equi-join on cell_id:\n$plan")
  }
}
