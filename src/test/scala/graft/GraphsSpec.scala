package graft

import graft.operators.Graphs

/** Integer PageRank sanity: rank-mass conservation up to floor loss,
  * structural ordering (hubs above leaves), and symmetry.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("star graph: center outranks leaves, symmetric leaves tie exactly") {
    val edges = Seq(("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"))
      .toDF("src", "dst")
    val pr = Graphs.integerPageRank(edges, iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr.keySet === Set("hub", "a", "b", "c", "d"))
    val leaves = Set("a", "b", "c", "d").map(pr)
    assert(leaves.size === 1, s"asymmetric leaf ranks: $pr") // exact tie
    assert(pr("hub") > leaves.head, s"hub not dominant: $pr")
  }

  test("rank mass is conserved up to floor loss") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"))
      .toDF("src", "dst")
    val pr = Graphs.integerPageRank(edges, iters = 3)
      .collect().map(_.getLong(1))
    val total = pr.sum
    // every floor division loses < 1 unit per term; with 4 nodes and
    // 10 directed edges over 3 iterations the loss is bounded far
    // below 1% of the 1e12 mass
    assert(total <= Graphs.RankScale)
    assert(total > (Graphs.RankScale * 99) / 100, s"mass lost: $total")
    assert(pr.forall(_ > 0))
  }

  test("two-node path: exact hand-computed fixpoint after one iteration") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val pr = Graphs.integerPageRank(edges, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = Graphs.RankScale
    val expected = (15 * s) / (100 * 2) + (85 * (s / 2)) / 100
    assert(pr("a") === expected && pr("b") === expected, s"$pr vs $expected")
  }
}
