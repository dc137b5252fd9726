package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global order statistics (running totals, exact ntile) WITHOUT a
  * single-partition global window.
  *
  * `sum(x) over (order by k)` and `ntile(n) over (order by k)` are
  * correct Spark but funnel the whole frame through ONE task — the
  * classic scale cliff once the frame is data-grain (users, parts,
  * suppliers at 100 TB). The two formulations here keep every window
  * partitioned:
  *
  *  - [[prefixSum]]: running total within a COARSE BLOCK (a
  *    partitioned window, bounded partitions by construction) plus a
  *    per-block carry computed on the block-grain frame — which is
  *    orders of magnitude smaller than the input (months vs days,
  *    32 hash buckets vs users), so its strict-prefix theta-join is
  *    a broadcast over a handful of rows.
  *  - [[ntileExact]]: order-consistent range bucketing via
  *    percentile_approx cutpoints (a 1-row partial-aggregatable
  *    sketch, broadcast back), per-bucket row_number (partitioned
  *    window), bucket-count offsets (tiny frame), then the exact
  *    SQL ntile arithmetic on the reconstructed global rank. The
  *    cutpoints only steer load balance — any order-consistent
  *    bucketing yields the identical result, so sketch error and
  *    merge-order nondeterminism cannot change the output.
  */
object Ranks {

  /** Strict prefix sum over a TINY keyed frame (blocks, buckets) via
    * a broadcast theta-join: O(rows²) compares on a frame that is
    * bounded by construction. Shared by [[prefixSum]] (block carries)
    * and [[ntileExact]] (bucket offsets) so the null/tiebreak
    * semantics cannot drift between them. Output: (key, out), out
    * NULL for the first key (no strict predecessors).
    */
  private def strictPrefixTiny(tiny: DataFrame, key: String, valCol: String,
                               out: String): DataFrame =
    tiny.as("a")
      .join(broadcast(tiny.as("b")), col(s"b.$key") < col(s"a.$key"), "left")
      .groupBy(col(s"a.$key"))
      .agg(sum(col(s"b.$valCol")).as(out))

  /** Running total of `valCol` along `orderCol` with no global
    * window. `block` must be a coarsening of `orderCol`'s order
    * (e.g. month-of-day): rows compare consistently across blocks.
    * `strict = true` excludes the current row (carry semantics).
    *
    * The input is persisted for the duration of the build (it feeds
    * the per-row window AND the block totals) and released after the
    * first action on the result (LshDedup caching contract).
    */
  def prefixSum(df: DataFrame, orderCol: String, valCol: String,
                block: Column, out: String,
                strict: Boolean = false): DataFrame = {
    val cached = df.persist()
    val blocked = cached.withColumn("__blk", block)
    val hi = if (strict) -1L else 0L
    val wIn = Window.partitionBy(col("__blk")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, hi)
    // block-grain strict prefix: tiny frame, broadcast theta-join —
    // O(blocks²) compares on a bounded frame beats one unbounded task
    val blocks = blocked.groupBy(col("__blk")).agg(sum(col(valCol)).as("__btot"))
    val carry = strictPrefixTiny(blocks, "__blk", "__btot", "__carry")
    val res = blocked
      .withColumn("__intra", sum(col(valCol)).over(wIn))
      .join(broadcast(carry), "__blk")
      .withColumn(out,
        coalesce(col("__intra"), lit(0)) + coalesce(col("__carry"), lit(0)))
      .drop("__blk", "__intra", "__carry")
    LshDedup.unpersistAfterFirstUse(res, cached)
  }

  /** Cross-joins a ONE-ROW global aggregate of `df` back onto `df`
    * with a single scan of the input: the input is persisted while
    * both branches run and released after the first action on the
    * result (LshDedup caching contract). This replaces the two bad
    * forms of "compare each group to the global": the
    * empty-partition-spec window (funnels the whole frame through
    * one task) and the re-aggregate + join-back (a second fact scan —
    * measured: the subtrees canonicalize differently, so AQE never
    * reuses the exchange). The aggregate is partial-aggregatable and
    * the join is a 1-row broadcast.
    */
  def withGlobalAgg(df: DataFrame, aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty)
    val cached = df.persist()
    val g = cached.agg(aggs.head, aggs.tail: _*)
    LshDedup.unpersistAfterFirstUse(cached.crossJoin(broadcast(g)), cached)
  }

  /** Exact `ntile(k) over (order by valueCol DESC, idCol ASC)` with
    * no global window, appended as LONG column `out`.
    *
    * Requires `idCol` to be a tiebreak making the order total (the
    * SQL ntile is only well-defined under a total order anyway).
    * Bucketing is by `valueCol` alone, so order-consistency across
    * buckets holds even at cutpoint ties (equal values land in the
    * same bucket; the partitioned window breaks the tie by idCol
    * inside it). Heavy value ties concentrate in one bucket — the
    * partition then holds that tie class, not the whole frame.
    */
  def ntileExact(df: DataFrame, k: Int, valueCol: String, idCol: String,
                 out: String = "ntile", nBuckets: Int = 32): DataFrame = {
    require(k > 0 && nBuckets > 1)
    val cached = df.persist()
    val fracs = (1 until nBuckets).map(i => lit(i.toDouble / nBuckets))
    val cuts = cached.agg(
      percentile_approx(col(valueCol), array(fracs: _*), lit(10000))
        .as("__cuts"))
    // bucket id ascending along the DESC order: number of cutpoints
    // strictly above this value (monotone, tie-consistent). NULL
    // values sort last under DESC (Spark's default NULLS LAST), so
    // they get the sentinel bucket AFTER every cutpoint bucket —
    // bit-equal to the window form even on nullable inputs. Persisted
    // as well: the ranked window, the bucket counts and the offsets
    // all branch from here — without the cache each branch would
    // re-run the cutpoint join + bucket lambda over the input
    val b = cached.crossJoin(broadcast(cuts))
      .withColumn("__bkt",
        when(col(valueCol).isNull, lit(nBuckets))
          .otherwise(size(filter(col("__cuts"), c => col(valueCol) < c))))
      .drop("__cuts")
      .persist()
    val wLocal = Window.partitionBy(col("__bkt"))
      .orderBy(col(valueCol).desc, col(idCol))
    val ranked = b.withColumn("__lrn", row_number().over(wLocal).cast("long"))
    val counts = b.groupBy(col("__bkt")).agg(count(lit(1)).as("__bcnt"))
    val offsets = strictPrefixTiny(counts, "__bkt", "__bcnt", "__off")
    val total = counts.agg(sum(col("__bcnt")).as("__n"))
    // exact SQL ntile: the first (n mod k) tiles hold ⌈n/k⌉ rows, the
    // rest ⌊n/k⌋ — pure integer arithmetic on the reconstructed
    // global rank (CASE branches are evaluated lazily, so the ELSE's
    // div-by-zero when n < k is never reached: the WHEN then covers
    // every rank)
    val res = ranked
      .join(broadcast(offsets), "__bkt")
      .crossJoin(broadcast(total))
      .withColumn("__rn", coalesce(col("__off"), lit(0L)) + col("__lrn"))
      .withColumn(out, expr(
        s"""CASE WHEN __rn <= (__n % $k) * (__n div $k + 1)
           |THEN (__rn - 1) div (__n div $k + 1) + 1
           |ELSE (__n % $k) + (__rn - (__n % $k) * (__n div $k + 1) - 1) div (__n div $k) + 1
           |END""".stripMargin).cast("long"))
      .drop("__bkt", "__lrn", "__off", "__n", "__rn")
    LshDedup.unpersistAfterFirstUse(
      LshDedup.unpersistAfterFirstUse(res, cached), b)
  }
}
