package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** Deterministic fixed-point k-means: semantics + the engine-
  * portability invariants the DuckDB oracle depends on.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated blobs plus one point equidistant-ish
  private lazy val vecs = Seq(
    (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)), (2L, Array(0.0f, 0.1f)),
    (10L, Array(5.0f, 5.0f)), (11L, Array(5.1f, 5.0f)), (12L, Array(5.0f, 5.1f))
  ).toDF("vec_id", "embedding")

  test("fit separates two obvious blobs") {
    val fit = KMeans.fit(vecs, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fit.size == 6)
    val low = Set(0L, 1L, 2L).map(fit)
    val high = Set(10L, 11L, 12L).map(fit)
    assert(low.size == 1 && high.size == 1 && low != high,
      s"blobs not separated: $fit")
  }

  test("training is invariant to partitioning and row order") {
    val base = KMeans.fit(vecs, k = 2, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val shuffled = KMeans.fit(
      vecs.repartition(7, col("embedding")).sortWithinPartitions(desc("vec_id")),
      k = 2, iters = 2).orderBy("vec_id").collect().toSeq
    assert(base == shuffled)
  }

  test("assignment ties break to the lowest cluster id") {
    val cents = Seq((5L, Seq(0L, 0L)), (3L, Seq(4L, 0L))).toDF("cluster", "cent")
    val point = Seq((99L, Seq(2L, 0L))).toDF("vec_id", "qv") // dist 4 to both
    val got = KMeans.assign(point, cents).select("cluster").as[Long].head()
    assert(got == 3L)
  }

  test("centroid division truncates toward zero (negative sums included)") {
    // cluster of two members summing to (-7, 7) → -7 div 2 = -3 (not
    // floor's -4): must match DuckDB's `//`
    val assigned = Seq(
      (1L, 1L, 0L, Seq(-3L, 3L)), (2L, 1L, 0L, Seq(-4L, 4L))
    ).toDF("vec_id", "cluster", "dist", "qv")
    val cent = KMeans.update(assigned).select("cent").as[Seq[Long]].head()
    assert(cent == Seq(-3L, 3L))
  }

  test("quantization floors the exact double product") {
    val q = KMeans.quantize(Seq((1L, Array(-0.5f, 0.25f))).toDF("vec_id", "embedding"))
      .select("qv").as[Seq[Long]].head()
    assert(q == Seq(-524288L, 262144L))
  }

  test("quality sums per-cluster inertia exactly") {
    val fitted = KMeans.fit(vecs, k = 2, iters = 2)
    val q = KMeans.quality(fitted).orderBy("cluster").collect()
    assert(q.map(_.getLong(1)).sum == 6) // every vector counted once
    val direct = fitted.agg(sum(col("dist").cast("decimal(38,0)")).cast("long"))
      .as[Long].head()
    assert(q.map(_.getLong(2)).sum == direct)
  }

  test("semDedup drops the later of two near-identical in-cluster vectors only") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.999f, 0.001f)), // near-dups, same blob
      (2L, Array(0.0f, 1.0f)),                              // other blob, alone
      (3L, Array(0.7f, 0.7f))                               // same blob as 2? distinct dir
    ).toDF("vec_id", "embedding")
    val out = KMeans.semDedup(emb, k = 2, iters = 1, threshold = 0.99)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(0L), "earliest member must always be kept")
    assert(!out(1L), "cosine ≈ 1 duplicate with an earlier peer must be dropped")
    assert(out(2L))
    assert(out.size == 4)
  }

  test("dead clusters disappear; k larger than n degrades gracefully") {
    val tiny = Seq((0L, Array(0.0f)), (1L, Array(10.0f))).toDF("vec_id", "embedding")
    val cents = KMeans.train(tiny, k = 5, iters = 2).collect()
    assert(cents.length <= 2 && cents.nonEmpty)
  }
}
