package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar feature-drift screens — the numeric-column companion to the
  * embedding-space [[Similarity.embedDrift]] family. A training-data
  * pipeline validates its FEATURES (event values, quality scores,
  * lengths) between cohorts — old/new snapshot, train/serve window,
  * A/B arm — with distribution-distance statistics over a bucketed
  * histogram; this module computes the two standard ones with the
  * repo's integer-exactness contract (no floating point in any output
  * column, so the readout is bit-identical on any engine, partition
  * count, or accumulation order):
  *
  *  - **Total variation** distance over `nBuckets` fixed-width
  *    buckets: TV = ½ Σ_b |p_a(b) − p_b(b)|. Emitted as
  *    `tv_e12` = ⌊TV · 10¹²⌋ via cross-multiplied integer counts:
  *    Σ|c_a·n_b − c_b·n_a| · 10¹² / (2·n_a·n_b), all in
  *    DECIMAL(38,0) with the exact floor-division trick
  *    ((x − x mod p) / p — the quotient is an integer, so Spark's
  *    scale-6 decimal rounding never fires).
  *  - **Kolmogorov–Smirnov** statistic over the same buckets:
  *    KS = max_b |CDF_a(b) − CDF_b(b)|, emitted as `ks_e12` the same
  *    way from cumulative counts.
  *
  * PSI (the third common screen) is deliberately NOT offered: its
  * per-bucket ln(p_a/p_b) term cannot be made integer-exact, and the
  * repo's oracle convention (NOTES_r14) bans multi-term float sums in
  * contested outputs; TV and KS carry the same decision signal with
  * exact arithmetic.
  *
  * Scale shape: one bounds aggregate (1 row, broadcast back — a
  * column-pruned min/max scan), then ONE corpus scan into a
  * `nBuckets`-row conditional aggregate — the same
  * corpus-size-independent state shape as [[Similarity.driftSums]]
  * (nothing corpus-sized shuffles; map-side combine does the work).
  * The KS cumulative runs as a self-join over the localCheckpoint'd
  * ≤ nBuckets-row histogram (PlanSpec bans unpartitioned Windows
  * repo-wide; an O(B²) join on ≤ 64 rows is free and plan-safe).
  *
  * NULL/NaN values are excluded (a null has no position on the value
  * axis; count them with a data-quality screen, not a drift
  * statistic). `cohort` must evaluate to 0 or 1, like
  * [[Similarity.driftSums]]; other values are ignored.
  */
object ScalarDrift {

  /** Per-bucket cohort histogram of `value` micro-quantized
    * (⌊v·10⁶⌋) into `nBuckets` fixed-width buckets over the GLOBAL
    * [min, max] — (bucket, c_a, c_b) plus the broadcast bounds
    * columns (mn, width) so callers can label bucket edges.
    */
  def histogram(df: DataFrame, cohort: Column, value: Column,
                nBuckets: Int): DataFrame = {
    val v = value.cast("double")
    val base = df
      .filter(v.isNotNull && !isnan(v))
      .select(cohort.cast("int").as("cohort"),
        floor(v * lit(1e6)).cast("long").as("m"))
    val bounds = base.agg(min(col("m")).as("mn"), max(col("m")).as("mx"))
    base.crossJoin(broadcast(bounds))
      // integer width so bucket arithmetic is exact; +1 keeps the max
      // value inside bucket nBuckets-1
      .selectExpr("cohort", "mn",
        s"(mx - mn) DIV ${nBuckets}L + 1L AS width",
        s"(m - mn) DIV ((mx - mn) DIV ${nBuckets}L + 1L) AS bucket")
      .groupBy(col("bucket"), col("mn"), col("width"))
      .agg(
        sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c_a"),
        sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c_b"))
  }

  /** One-row integer-exact drift readout over `value` between the two
    * `cohort` arms: (n_a, n_b, tv_e12, ks_e12). NULL statistics when
    * either cohort is empty.
    */
  def valueDrift(df: DataFrame, cohort: Column, value: Column,
                 nBuckets: Int = 32): DataFrame = {
    val h = histogram(df, cohort, value, nBuckets)
      .select(col("bucket"), col("c_a"), col("c_b"))
      .localCheckpoint(true)
    val n = h.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    // cumulative counts: O(B²) self-join on the checkpointed ≤
    // nBuckets-row frame (no unpartitioned Window)
    val cum = h.as("x")
      .join(h.as("y"), col("y.bucket") <= col("x.bucket"))
      .groupBy(col("x.bucket"))
      .agg(sum(col("y.c_a")).as("ca_cum"), sum(col("y.c_b")).as("cb_cum"))
    val terms = h.crossJoin(broadcast(n))
      .select(
        (abs(col("c_a").cast("decimal(38,0)") * col("n_b")
          - col("c_b").cast("decimal(38,0)") * col("n_a")))
          .as("tv_term"))
      .agg(sum(col("tv_term")).as("tv_num"))
    val ksMax = cum.crossJoin(broadcast(n))
      .select(
        (abs(col("ca_cum").cast("decimal(38,0)") * col("n_b")
          - col("cb_cum").cast("decimal(38,0)") * col("n_a")))
          .as("gap"))
      .agg(max(col("gap")).as("ks_num"))
    n.crossJoin(broadcast(terms)).crossJoin(broadcast(ksMax))
      .selectExpr(
        "CAST(coalesce(n_a, 0L) AS BIGINT) AS n_a",
        "CAST(coalesce(n_b, 0L) AS BIGINT) AS n_b",
        // exact floor-div: numerator and denominator non-negative, the
        // subtraction makes the quotient an integer, so the decimal
        // divide is exact (scale-6 rounding never fires)
        """CASE WHEN coalesce(n_a, 0L) = 0L OR coalesce(n_b, 0L) = 0L
          |  THEN CAST(NULL AS BIGINT)
          |  ELSE CAST(((tv_num * CAST(1000000000000 AS DECIMAL(38,0)))
          |    - (tv_num * CAST(1000000000000 AS DECIMAL(38,0)))
          |        % (CAST(2 AS DECIMAL(38,0)) * n_a * n_b))
          |    / (CAST(2 AS DECIMAL(38,0)) * n_a * n_b) AS BIGINT)
          |END AS tv_e12""".stripMargin,
        """CASE WHEN coalesce(n_a, 0L) = 0L OR coalesce(n_b, 0L) = 0L
          |  THEN CAST(NULL AS BIGINT)
          |  ELSE CAST(((ks_num * CAST(1000000000000 AS DECIMAL(38,0)))
          |    - (ks_num * CAST(1000000000000 AS DECIMAL(38,0)))
          |        % (CAST(n_a AS DECIMAL(38,0)) * n_b))
          |    / (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)
          |END AS ks_e12""".stripMargin)
  }

  /** Per-segment drift diagnosis: the `k` segments whose total
    * variation between the cohort arms is largest — what a pipeline
    * operator looks at AFTER [[valueDrift]] trips (WHICH event type /
    * source / shard drifted). Buckets use the GLOBAL bounds so
    * segments are comparable. Emits (segment, n_a, n_b, tv_e12)
    * ordered by tv_e12 desc with segment as the exact tie-break;
    * segments where either arm is empty are excluded (their TV is
    * undefined, and a disappeared segment is a volume screen's job).
    *
    * Scale shape: ONE corpus scan into a (segments × nBuckets)-row
    * aggregate, a segment-grain roll-up joined back broadcast (the
    * segment dimension is bounded — event types, sources), and a
    * TakeOrderedAndProject top-k. Corpus-size-independent state, like
    * the global screen.
    */
  def valueDriftBySegment(df: DataFrame, segment: Column, cohort: Column,
                          value: Column, nBuckets: Int = 32,
                          k: Int = 5): DataFrame = {
    val v = value.cast("double")
    val base = df
      .filter(v.isNotNull && !isnan(v))
      .select(segment.as("segment"), cohort.cast("int").as("cohort"),
        floor(v * lit(1e6)).cast("long").as("m"))
    val bounds = base.agg(min(col("m")).as("mn"), max(col("m")).as("mx"))
    val hist = base.crossJoin(broadcast(bounds))
      .selectExpr("segment", "cohort",
        s"(m - mn) DIV ((mx - mn) DIV ${nBuckets}L + 1L) AS bucket")
      .groupBy(col("segment"), col("bucket"))
      .agg(
        sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("c_a"),
        sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("c_b"))
    val perSeg = hist.groupBy(col("segment"))
      .agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    hist.join(broadcast(perSeg), "segment")
      .filter(col("n_a") > 0L && col("n_b") > 0L)
      .select(col("segment"), col("n_a"), col("n_b"),
        abs(col("c_a").cast("decimal(38,0)") * col("n_b")
          - col("c_b").cast("decimal(38,0)") * col("n_a")).as("tv_term"))
      .groupBy(col("segment"), col("n_a"), col("n_b"))
      .agg(sum(col("tv_term")).as("tv_num"))
      .selectExpr("segment",
        "CAST(n_a AS BIGINT) AS n_a", "CAST(n_b AS BIGINT) AS n_b",
        """CAST(((tv_num * CAST(1000000000000 AS DECIMAL(38,0)))
          |  - (tv_num * CAST(1000000000000 AS DECIMAL(38,0)))
          |      % (CAST(2 AS DECIMAL(38,0)) * n_a * n_b))
          |  / (CAST(2 AS DECIMAL(38,0)) * n_a * n_b) AS BIGINT)
          |  AS tv_e12""".stripMargin)
      .orderBy(col("tv_e12").desc, col("segment"))
      .limit(k)
  }
}
