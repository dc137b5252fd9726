package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge DataFrames — the Pregel-shaped
  * family beyond [[Dedup.connectedComponents]].
  *
  * PageRank here is computed in INTEGER units (1e12 = rank mass 1.0)
  * with floor division at every step: deterministic to the bit at any
  * parallelism and replicable in any engine — FP PageRank is
  * accumulation-order-dependent and can never sit under a cross-engine
  * hash gate. Scale design: one edge-shuffle per iteration (the
  * contribution groupBy), the degree reattachment reuses the same
  * hash partitioning, and the node-count factor rides a 1-row
  * broadcast — the standard distributed PageRank schedule.
  */
object Graphs {

  val RankScale: Long = 1000000000000L // 1.0 of rank mass, integer units

  /** Symmetrize + dedup a directed edge list (random-walk graph). */
  def symmetrized(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Integer-unit PageRank with damping 0.85 over an UNDIRECTED graph
    * (pass a directed edge list; it is symmetrized). `iters` fixed
    * iterations, no convergence test — the oracle unrolls the same
    * count. Every node keeps degree ≥ 1 by construction, so there is
    * no dangling-mass term.
    *
    * pr₀ = S div n;  prₖ₊₁(v) = (15·S) div (100·n)
    *                           + (85 · Σ_{u~v} prₖ(u) div deg(u)) div 100
    */
  def integerPageRank(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1)
    // the edge list feeds every iteration — persist it rather than
    // re-deriving the upstream join per iteration (released after the
    // first action via the shared listener, LshDedup contract)
    val sym = symmetrized(edges).persist()
    // deg feeds every iteration's reattachment join; without its own
    // persist each iteration re-aggregates the edge list (an extra
    // edge-cardinality exchange per round). Node-cardinality cache.
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .persist()
    val nFrame = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(nFrame))
      .select(col("node"), col("deg"), col("n"),
        expr(s"${RankScale}L div n").as("pr"))
    for (_ <- 1 to iters) {
      val contrib = sym
        .join(pr, sym("src") === pr("node"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
      pr = contrib
        .groupBy(col("node"))
        .agg(sum(col("c")).as("csum"))
        .join(deg, "node")
        .crossJoin(broadcast(nFrame))
        .select(col("node"), col("deg"), col("n"),
          expr(s"(15 * ${RankScale}L) div (100 * n) + (85 * csum) div 100")
            .as("pr"))
    }
    val result = pr.select(col("node"), col("pr").as("pr_int"))
    LshDedup.unpersistAfterFirstUse(
      LshDedup.unpersistAfterFirstUse(result, sym), deg)
  }
}
