package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels every node with its component minimum") {
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,6}, {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L), (8L, 7L))
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents labels docs appearing only in self-pairs") {
    // (4,4) is a singleton component: the self-loop carries no edge,
    // but the doc must still get a label row (itself) — callers feed
    // raw pair lists that can include reflexive matches
    val pairs = Seq((1L, 2L), (4L, 4L), (2L, 2L))
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 4L -> 4L))
  }

  test("largeStar/smallStar window rewrite == brute-force star semantics") {
    // pins the r15 single-exchange window formulation to the paper
    // definitions on a deterministic pseudo-random graph: largeStar
    // links every LARGER neighbor of u to min(N(u) ∪ {u}); smallStar
    // links every SMALLER neighbor (and u itself) of u to min of
    // u's smaller neighborhood — both as deduped (src, dst) sets
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(200)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.distinct
    val e = edges.toDF("src", "dst")
    // reference largeStar
    val nbr = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2).toSet }
    val lsRef = nbr.toSeq.flatMap { case (u, ns) =>
      val m = (ns + u).min
      ns.filter(_ > u).map(v => (v, m))
    }.filter { case (a, b) => a != b }.toSet
    val lsGot = Dedup.largeStar(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsGot === lsRef)
    // reference smallStar (over the canonical src>dst orientation)
    val oriented = edges.map { case (a, b) => (a max b, a min b) }.distinct
    val smaller = oriented.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val ssRef = smaller.toSeq.flatMap { case (u, ns) =>
      val m = ns.min
      (ns :+ u).map(v => (v, m))
    }.filter { case (a, b) => a != b }.toSet
    val ssGot = Dedup.smallStar(e.select(col("src"), col("dst"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ssGot === ssRef)
  }

  test("incrementalComponents == full recompute, including cluster merges and singletons") {
    // base: {1,2,3} and {10,11} and singleton 20 (self-pair only)
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
      .toDF("doc_a", "doc_b")
    val assignments = Dedup.connectedComponents(base)
    // new batch: 30 joins {10,11}; 40-41 form a new cluster; and the
    // bridge (3,10) MERGES the two base clusters — the hard case: the
    // merged label must drop to the global min 1, overwriting the old
    // root 10
    val newPairs = Seq((30L, 10L), (40L, 41L), (3L, 10L))
      .toDF("doc_a", "doc_b")
    val incr = Dedup.incrementalComponents(assignments, newPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(base.unionByName(newPairs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr === full)
    assert(incr(30L) === 1L && incr(11L) === 1L) // merge really happened
    assert(incr(20L) === 20L)                    // singleton survives
  }

  test("connectedComponents converges on a chain far longer than the round budget") {
    // a 60-node path: min-label alone needs 60 one-hop rounds, well
    // past maxIter — pointer-jumping must close it in ~log2(60) rounds
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(chain, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 60)
    assert(cc.values.forall(_ === 0L), s"non-converged labels: $cc")
  }

  test("connectedComponents: 1000-node path with scrambled ids and the min mid-chain") {
    // ids are a permutation of 0..999 laid out along the path, so the
    // component minimum sits at an arbitrary interior position and
    // labels must propagate BOTH directions across ~500 hops — the
    // adversarial case for propagate-min. Pointer-jumping has to
    // close it in ~log2(1000) ≈ 10 doubling rounds (budget 16).
    val perm = (0L until 1000L).map(i => (i * 541L) % 1000L) // 541 coprime to 1000
    val path = perm.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(path, maxIter = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 1000)
    assert(cc.values.forall(_ === 0L),
      s"labels not all 0: ${cc.filter(_._2 != 0L).take(5)}")
  }

  test("dropStats counts the buckets and doc-slots the LSH skew cap drops") {
    import graft.operators.LshDedup
    // spam corpus: 40 identical docs (every band bucket has 40 docs)
    // plus distinct fillers
    val spam = (0 until 40).map(i => (i.toLong, "the same spam text repeated over and over again"))
    val fillers = (100 until 110).map(i => (i.toLong, s"unique filler document number $i with distinct words $i"))
    val docs = (spam ++ fillers).toDF("doc_id", "text")
    // cap below the spam bucket size: all 16 spam bands drop
    val stats = LshDedup.dropStats(docs, maxBucket = 10).collect().head
    assert(stats.getAs[Long]("n_buckets_dropped") === 16L)
    assert(stats.getAs[Long]("n_doc_slots_dropped") === 16L * 40)
    // with a generous cap nothing drops and the summary is zeros
    val clean = LshDedup.dropStats(docs, maxBucket = 1000).collect().head
    assert(clean.getAs[Long]("n_buckets_dropped") === 0L)
    assert(clean.getAs[Long]("n_doc_slots_dropped") === 0L)
  }

  test("dedupCorpus removes exactly the non-representative near-dups") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val kept = Dedup.dedupCorpus(docs, jaccardThreshold = 0.8)
    assert(kept.count() < docs.count()) // the synthetic corpus has near-dups
    // every removed doc has a kept near-dup partner with smaller id
    // (cluster representative invariant)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert(keptIds.nonEmpty)
    val removed = docs.select("doc_id").as[Long].collect().toSet -- keptIds
    assert(removed.nonEmpty)
    assert(removed.forall(r => keptIds.exists(_ < r)))
  }

  test("dedupCorpusExact: representative invariant and exact-path determinism") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val kept = Dedup.dedupCorpusExact(docs, jaccardThreshold = 0.8)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    val removed = all -- keptIds
    assert(keptIds.nonEmpty && removed.nonEmpty)
    // every survivor is the minimum of its duplicate cluster: no
    // removed doc can be smaller than ALL survivors it duplicates —
    // weak form checked cheaply: min doc overall always survives
    assert(keptIds.contains(all.min))
    // exact path ⊇ LSH path's survivors can differ only by LSH recall;
    // rerunning the exact path must reproduce itself bit-for-bit
    val again = Dedup.dedupCorpusExact(docs, jaccardThreshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(again === keptIds)
  }

  test("ivfTrain: Lloyd-refined centroids keep the index valid and recall healthy") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 10)
    val trained = Similarity.ivfTrain(emb, nCells = 8, iters = 2)
    assert(trained.count() <= 8 && trained.count() > 0)
    // trained centroids have the vector dimensionality
    assert(trained.select(size($"centroid")).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(64))
    val index = Similarity.ivfAssign(emb, trained)
    assert(index.count() === emb.count()) // still a partition of the corpus
    val brute = Similarity.knnBrute(emb, queries, topK = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfSearch(index, trained, queries, topK = 5, nProbe = 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"trained-IVF recall $recall too low")
  }

  test("IVF search recall vs brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 10)
    val centroids = Similarity.ivfCentroids(emb, nCells = 8)
    val index = Similarity.ivfIndex(emb, nCells = 8)
    // index is a partition of the corpus
    assert(index.count() === emb.count())
    assert(index.select("cell_id").distinct().count() <= 8)
    val brute = Similarity.knnBrute(emb, queries, topK = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfSearch(index, centroids, queries, topK = 5, nProbe = 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low")
  }
}
