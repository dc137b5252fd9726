package graft

import org.apache.spark.sql.functions._

import graft.operators.ScalarDrift

/** The scalar feature-drift screens' invariants: exact endpoints
  * (identical cohorts → 0, disjoint cohorts → 10¹²), degenerate
  * inputs, partition invariance (the integer-exactness claim), and
  * the per-segment diagnosis contract.
  */
class ScalarDriftSpec extends SparkSpec {
  import spark.implicits._

  private def drift(rows: Seq[(Int, Double)], parts: Int = 4) =
    ScalarDrift.valueDrift(
      rows.toDF("cohort", "value").repartition(parts),
      col("cohort"), col("value"))
      .head()

  test("identical cohort distributions read zero drift") {
    val vals = (0 until 200).map(i => (i * 7 % 100).toDouble / 3.0)
    val r = drift(vals.map(v => (0, v)) ++ vals.map(v => (1, v)))
    assert(r.getLong(0) === 200L && r.getLong(1) === 200L)
    assert(r.getLong(2) === 0L, "tv_e12 must be 0 on identical arms")
    assert(r.getLong(3) === 0L, "ks_e12 must be 0 on identical arms")
  }

  test("disjoint cohort distributions read full drift (1e12)") {
    val r = drift(
      (0 until 100).map(i => (0, i.toDouble)) ++
        (0 until 100).map(i => (1, 1000.0 + i)))
    assert(r.getLong(2) === 1000000000000L)
    assert(r.getLong(3) === 1000000000000L)
  }

  test("empty arm yields NULL statistics; null/NaN values and off-domain cohorts are excluded") {
    val df = Seq((0, 1.0), (0, 2.0), (2, 3.0))
      .toDF("cohort", "value")
      .union(Seq((0, Double.NaN)).toDF("cohort", "value"))
    val r = ScalarDrift.valueDrift(df, col("cohort"), col("value")).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L)
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("readout is partition-invariant bit for bit") {
    val rows = (0 until 500).map { i =>
      (i % 2, math.sin(i * 0.37) * 250.0 + (i % 2) * 40.0)
    }
    val a = drift(rows, parts = 1)
    val b = drift(rows, parts = 7)
    assert(a === b)
  }

  test("KS is at least TV's largest single-bucket term and both are in [0, 1e12]") {
    val rows = (0 until 400).map { i =>
      (i % 2, (i * 13 % 97).toDouble + (i % 2) * 9.0)
    }
    val r = drift(rows)
    val tv = r.getLong(2); val ks = r.getLong(3)
    assert(tv >= 0L && tv <= 1000000000000L)
    assert(ks >= 0L && ks <= 1000000000000L)
  }

  test("per-segment diagnosis ranks the drifted segment first and drops empty-arm segments") {
    // segment "stable": identical arms; "shifted": disjoint arms;
    // "lopsided": cohort-0 only (must be excluded)
    val rows =
      (0 until 100).flatMap(i => Seq(("stable", 0, i.toDouble),
        ("stable", 1, i.toDouble))) ++
        (0 until 100).map(i => ("shifted", 0, i.toDouble)) ++
        (0 until 100).map(i => ("shifted", 1, 400.0 + i)) ++
        (0 until 50).map(i => ("lopsided", 0, i.toDouble))
    val out = ScalarDrift.valueDriftBySegment(
      rows.toDF("segment", "cohort", "value"),
      col("segment"), col("cohort"), col("value"), nBuckets = 32, k = 5)
      .collect()
    assert(out.map(_.getString(0)).toSeq === Seq("shifted", "stable"))
    assert(out.head.getLong(3) === 1000000000000L)
    assert(out(1).getLong(3) === 0L)
  }
}
