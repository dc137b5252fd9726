package graft

import org.apache.spark.sql.functions._

import graft.functions.{hamming_words, sign_bits}
import graft.operators.Similarity
import graft.sources.Tables

/** Binary (sign-bit) quantization ANN and the centroid outlier
  * screen: pack/popcount kernels against naive replays, the two-stage
  * retrieval against brute force, and the determinism contract of the
  * integer centroid direction.
  */
class BinaryAnnSpec extends SparkSpec {

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

  test("sign_bits packs bit d of word d/64 iff v[d] > 0, any dim") {
    import spark.implicits._
    // 3 words worth of dims with the tail word partial; zeros are NOT
    // set (strict > 0, the engine-portable sign test)
    val dims = 130
    val vec = Array.tabulate(dims)(i =>
      if (i % 3 == 0) 1.5f else if (i % 3 == 1) -0.25f else 0.0f)
    val got = Seq(Tuple1(vec.toSeq)).toDF("embedding")
      .select(sign_bits(col("embedding")).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(got.length == 3) // ceil(130/64)
    val want = new Array[Long](3)
    vec.zipWithIndex.foreach { case (v, i) =>
      if (v > 0f) want(i >>> 6) |= 1L << (i & 63)
    }
    assert(got == want.toSeq)
  }

  test("hamming_words equals the per-dimension sign-disagreement count") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .orderBy(col("vec_id")).collect().map(_.getSeq[Float](1))
    val df = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .select(col("vec_id"), sign_bits(col("embedding")).as("sig"))
    val a = df.select(col("vec_id").as("ia"), col("sig").as("sa"))
    val b = df.select(col("vec_id").as("ib"), col("sig").as("sb"))
    val got = a.crossJoin(b)
      .select(col("ia"), col("ib"), hamming_words(col("sa"), col("sb")).as("hd"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (i <- emb.indices; j <- emb.indices) {
      val want = emb(i).zip(emb(j)).count { case (x, y) => (x > 0f) != (y > 0f) }
      assert(got((i.toLong, j.toLong)) == want, s"pair ($i,$j)")
    }
  }

  test("hamming_words is NULL on word-length mismatch") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
      .select(hamming_words(col("a"), col("b")).as("hd"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("annBinary at coarseK = corpus size IS brute force") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    val q = emb.filter(col("vec_id") < 3)
    val got = Similarity.annBinary(emb, q, topK = 10, coarseK = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = Similarity.knnBrute(emb, q, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("annBinary coarse stage keeps hamming-nearest candidates exactly") {
    // replay the coarse stage driver-side: top-coarseK by (sign
    // disagreements asc, vec_id) must be the candidate set the
    // re-rank sees — pin via a coarseK small enough to bite
    val emb = Tables.embeddings(spark, sf)
    val rows = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1)
    val qv = rows.take(1)
    val coarseK = 25
    val out = Similarity.annBinary(emb, emb.filter(col("vec_id") === 0L),
      topK = coarseK, coarseK = coarseK)
      .collect().map(_.getLong(2)).toSet
    val wantCand = rows.map { case (id, e) =>
      (rows.head._2.zip(e).count { case (x, y) => (x > 0f) != (y > 0f) }, id)
    }.sorted.take(coarseK).map(_._2).toSet
    assert(qv.head._1 == 0L)
    assert(out == wantCand)
  }

  test("sign_dot equals the micro-quantized signed sum replay") {
    import spark.implicits._
    val q = Array(0.5f, -0.25f, 0.0f, 1.75f, -2.0f)
    val c = Array(1.0f, 1.0f, -1.0f, -1.0f, 1.0f) // signs: 1,1,0,0,1
    val got = Seq((q.toSeq, c.toSeq)).toDF("q", "c")
      .select(graft.functions.sign_dot(col("q"),
        graft.functions.sign_bits(col("c"))).as("sd"))
      .collect()(0).getLong(0)
    val want = q.zip(c).map { case (x, v) =>
      val m = math.floor(x.toDouble * 1e6).toLong
      if (v > 0f) m else -m
    }.sum
    assert(got == want)
  }

  test("sign_dot crosses word boundaries correctly (multi-word, partial tail)") {
    import spark.implicits._
    // 130 dims = 2 full words + a 2-bit tail; deterministic pattern
    val dims = 130
    val q = Array.tabulate(dims)(i => (i % 7).toFloat / 4f - 0.5f)
    val c = Array.tabulate(dims)(i => if (i % 3 == 0) 1f else -1f)
    val got = Seq((q.toSeq, c.toSeq)).toDF("q", "c")
      .select(graft.functions.sign_dot(col("q"),
        graft.functions.sign_bits(col("c"))).as("sd"))
      .collect()(0).getLong(0)
    val want = q.zip(c).map { case (x, v) =>
      val m = math.floor(x.toDouble * 1e6).toLong
      if (v > 0f) m else -m
    }.sum
    assert(got == want)
  }

  test("sign_dot is NULL when word count mismatches the query dims") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(1L, 2L))).toDF("q", "w")
      .select(graft.functions.sign_dot(col("q"), col("w")).as("sd"))
    assert(df.collect()(0).isNullAt(0)) // 2 dims needs 1 word, not 2
  }

  test("annBinaryAsym at coarseK = corpus size IS brute force") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    val q = emb.filter(col("vec_id") < 3)
    val got = Similarity.annBinaryAsym(emb, q, topK = 10, coarseK = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = Similarity.knnBrute(emb, q, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("asymmetric coarse recall dominates symmetric at a biting coarseK") {
    // same index, same budget: the candidate set from sign_dot must
    // recover at least as many true top-10 neighbors as hamming —
    // the measured property the operator's scaladoc claims
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 10)
    val truth = Similarity.knnBrute(emb, q, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .count(truth.contains)
    val sym = hits(Similarity.annBinary(emb, q, topK = 10, coarseK = 20))
    val asym = hits(Similarity.annBinaryAsym(emb, q, topK = 10, coarseK = 20))
    assert(asym >= sym, s"asym=$asym < sym=$sym")
    assert(asym > 0)
  }

  test("centroidDirection is exact long-sum arithmetic (order-independent)") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.centroidDirection(emb)
      .collect()(0).getSeq[Double](0)
    val rows = emb.collect().map(_.getSeq[Float](1))
    val dims = rows.head.length
    val sums = new Array[Long](dims)
    rows.foreach { e =>
      var i = 0
      while (i < dims) {
        sums(i) += math.floor(e(i).toDouble * 1e6).toLong; i += 1
      }
    }
    assert(got == sums.map(_.toDouble).toSeq)
    // and a repartitioned replay lands on the SAME bits
    val got2 = Similarity.centroidDirection(emb.repartition(7))
      .collect()(0).getSeq[Double](0)
    assert(got2 == got)
  }

  /** BigInt replay of the integer-exact drift readout: 13-bit
    * rescale by p = m div 2¹³ + 1 with floor division, then
    * sign(dot)·⌊dot²·10¹²/(naq·nbq)⌋ and the HUGEINT-exact
    * cross-multiplied gap — the same arithmetic the engine and the
    * DuckDB oracle both run.
    */
  private def driftClosedForm(sums: Array[Array[Long]],
                              ns: Array[Long]): (Long, BigInt) = {
    val dims = sums(0).length
    def floorDiv(x: Long, p: Long): Long = Math.floorDiv(x, p)
    val m = (sums(0) ++ sums(1)).foldLeft(0L)((a, s) => math.max(a, math.abs(s)))
    val p = m / 8192L + 1L
    val ta = sums(0).map(floorDiv(_, p))
    val tb = sums(1).map(floorDiv(_, p))
    val dot = (0 until dims).map(i => ta(i) * tb(i)).sum
    val naq = ta.map(t => t * t).sum
    val nbq = tb.map(t => t * t).sum
    val cos2 =
      if (naq == 0L || nbq == 0L) Long.MinValue // sentinel: expect null
      else (if (dot < 0) -1L else 1L) *
        (BigInt(dot) * BigInt(dot) * BigInt(1000000000000L) /
          (BigInt(naq) * BigInt(nbq))).toLong
    val mcd = (0 until dims)
      .map(i => (BigInt(sums(0)(i)) * ns(1) - BigInt(sums(1)(i)) * ns(0)).abs)
      .foldLeft(BigInt(0))(_ max _)
    (cos2, mcd)
  }

  test("embedDrift replays closed-form: exact cross-multiplied gap + cohort counts") {
    val emb = Tables.embeddings(spark, sf)
    val row = Similarity.embedDrift(emb, pmod(col("vec_id"), lit(2)))
      .collect()(0)
    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val dims = rows.head._2.length
    val sums = Array.ofDim[Long](2, dims)
    val ns = Array(0L, 0L)
    rows.foreach { case (id, e) =>
      val c = (id % 2).toInt
      ns(c) += 1
      var i = 0
      while (i < dims) {
        sums(c)(i) += math.floor(e(i).toDouble * 1e6).toLong; i += 1
      }
    }
    assert(row.getLong(0) == ns(0) && row.getLong(1) == ns(1))
    val (wantCos2, wantMax) = driftClosedForm(sums, ns)
    assert(BigInt(row.getLong(3)) == wantMax)
    assert(row.getLong(2) == wantCos2)
    // the fixed-point SIGNED cos² tracks sign(cos)·cos² of the float
    // cosine to the rescale resolution (~2⁻¹³ relative)
    val ca = sums(0).map(s => s.toDouble.toFloat)
    val cb = sums(1).map(s => s.toDouble.toFloat)
    val c = cosine(ca, cb)
    assert(math.abs(row.getLong(2).toDouble / 1e12 - math.signum(c) * c * c) < 1e-3)
    // identical cohorts drift nothing: cos² at the 1e12 ceiling band
    // and zero gap
    val same = Similarity.embedDrift(
      emb.withColumn("vec_id", col("vec_id") * 2)
        .union(emb.withColumn("vec_id", col("vec_id") * 2 + 1)),
      pmod(col("vec_id"), lit(2)))
      .collect()(0)
    assert(same.getLong(3) == 0L)
    assert(same.getLong(2) >= 999999000000L && same.getLong(2) <= 1000000000000L)
  }

  test("embedDrift pins ragged/negative-id/NaN/empty-cohort semantics") {
    import spark.implicits._
    // ragged arrays (dims 3, 2, 0), a negative odd id (pmod keeps it
    // in cohort 1; the oracle's ((x%2)+2)%2 matches), a NaN component
    // (quantizes to 0), and an empty embedding (still COUNTED in its
    // cohort — global counts, not per-position)
    val df = Seq(
      (0L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(0.5f, Float.NaN)),
      (-1L, Seq(2.0f, -4.0f)),
      (3L, Seq.empty[Float])
    ).toDF("vec_id", "embedding")
    val row = Similarity.embedDrift(df, pmod(col("vec_id"), lit(2)))
      .collect()(0)
    // cohort 0 = ids 0, 2 (n=2); cohort 1 = ids -1, 3 (n=2, the empty
    // array counts)
    assert(row.getLong(0) == 2L && row.getLong(1) == 2L)
    // micro sums with absent positions = 0 and NaN = 0:
    //   s_a = [1.5e6, 2e6, 3e6], s_b = [2e6, -4e6, 0]
    val sums = Array(Array(1500000L, 2000000L, 3000000L),
      Array(2000000L, -4000000L, 0L))
    val (wantCos2, wantMax) = driftClosedForm(sums, Array(2L, 2L))
    assert(row.getLong(2) == wantCos2)
    assert(BigInt(row.getLong(3)) == wantMax)
    // an empty cohort: cos² is NULL, the gap stays exact
    val lone = Similarity.embedDrift(
      Seq((0L, Seq(1.0f, -1.0f))).toDF("vec_id", "embedding"),
      pmod(col("vec_id"), lit(2))).collect()(0)
    assert(lone.getLong(0) == 1L && lone.getLong(1) == 0L)
    assert(lone.isNullAt(2))
    assert(lone.getLong(3) == 0L)
    // the per-dimension diagnosis ranks the same frame's exact gaps:
    // gaps per pos = |s_a·n_b − s_b·n_a| with n=(2,2) over the sums
    // above = pos0 |1.5e6·2 − 2e6·2| = 1e6, pos1 |2e6·2 + 4e6·2| =
    // 12e6, pos2 |3e6·2 − 0| = 6e6 → order (1, 2, 0)
    val dims3 = Similarity.embedDriftDims(df, pmod(col("vec_id"), lit(2)),
        k = 3).collect().map(r => (r.getInt(0), r.getLong(3)))
    assert(dims3.toSeq == Seq((1, 12000000L), (2, 6000000L), (0, 1000000L)))
  }

  test("semanticContamination replays closed-form: micro-cosine flags + integer argmax tie-break") {
    val emb = Tables.embeddings(spark, sf)
    val rows = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (ev, tr) = rows.partition(_._1 % 10 == 0)
    val th = 350000L
    val got = Similarity.semanticContamination(
        emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0L),
        emb.filter(pmod(col("vec_id"), lit(10L)) === 0L), th)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val want = tr.flatMap { case (tid, te) =>
      val hits = ev.map { case (eid, ee) =>
        (eid, math.floor(cosine(te, ee) * 1e6).toLong)
      }.filter(_._2 >= th)
      if (hits.isEmpty) None
      else {
        val best = hits.maxBy { case (eid, s) => (s, -eid) }
        Some((tid, best._1, best._2, hits.length.toLong))
      }
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty) // the threshold bites on this corpus
  }

  test("embedOutliers ranks ascending centroid cosine with vec_id ties") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.embedOutliers(emb, k = 15)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val centroid = Similarity.centroidDirection(emb)
      .collect()(0).getSeq[Double](0).map(_.toFloat).toSeq
    val want = emb.collect()
      .map(r => (cosine(r.getSeq[Float](1), centroid), r.getLong(0)))
      .sortBy(identity).take(15).zipWithIndex
      .map { case ((_, id), i) => (i + 1, id) }
    assert(got.toSeq == want.toSeq)
  }
}
