package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles via sort, not collect.
  *
  * Spark's built-in `percentile` aggregates by buffering every value
  * of a group in executor memory — fine for small groups, an OOM (and
  * a single-thread sort) on a 100-TB group. The sort-based
  * formulation — rank rows per group, keep only the two rows
  * straddling each target rank, interpolate — is one spillable
  * sort-shuffle with O(1) aggregation state, the classic scale-out
  * exact-quantile plan. Interpolation matches SQL quantile_cont:
  *   h = (n-1)·p, result = v⌊h⌋ + (h−⌊h⌋)·(v⌊h⌋₊₁ − v⌊h⌋).
  */
object Percentiles {

  /** One output row per group with one column per requested percentile
    * (named by `outNames`), values rounded to `scale` decimals.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
            ps: Seq[Double], outNames: Seq[String], scale: Int = 4): DataFrame = {
    require(ps.nonEmpty && ps.length == outNames.length)
    val g = groupCols.map(col)
    val ranked = df
      .select((g :+ col(valueCol)): _*)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(g: _*).orderBy(col(valueCol))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(g: _*)))

    // per-percentile straddling ranks + interpolation fraction
    // (all group-constants derived from __n)
    val n1 = col("__n") - 1
    val withTargets = ps.zip(outNames).foldLeft(ranked) { case (acc, (p, name)) =>
      acc
        .withColumn(s"__lo_$name", floor(n1 * lit(p)) + 1)
        .withColumn(s"__hi_$name", least(floor(n1 * lit(p)) + 2, col("__n")))
        .withColumn(s"__frac_$name", n1 * lit(p) - floor(n1 * lit(p)))
    }
    val keepAny = outNames.map { name =>
      col("__rn") === col(s"__lo_$name") || col("__rn") === col(s"__hi_$name")
    }.reduce(_ || _)
    val aggs = outNames.map { name =>
      val vLo = max(when(col("__rn") === col(s"__lo_$name"), col(valueCol)))
      val vHi = max(when(col("__rn") === col(s"__hi_$name"), col(valueCol)))
      val frac = max(col(s"__frac_$name"))
      round(vLo + frac * (vHi - vLo), scale).as(name)
    }
    withTargets
      .filter(keepAny)
      .groupBy(g: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
