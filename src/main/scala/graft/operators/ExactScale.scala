package graft.operators

import org.apache.spark.sql.DataFrame

/** Guard rail for the exact Θ(n²) ground-truth operators.
  *
  * The exact all-pairs paths (knnGraph, blockedNearDupPairs,
  * exactJaccardPairs*) are correct at any n but their compare volume
  * grows quadratically — they exist as ground-truth / calibration
  * references for the sub-quadratic production siblings (annLsh /
  * ivfSearch, lshNearDupPairs, jaccardVerified banding). At corpus
  * scale a pipeline should never reach them by accident, so each
  * exact entry point refuses inputs above a row ceiling unless the
  * caller explicitly opts in with force=true (a bounded calibration
  * sample, a recall audit).
  *
  * The count is one scan of the (already pruned) input — parquet
  * answers it from footer metadata — and is negligible next to the
  * quadratic work it gates.
  */
object ExactScale {

  /** 100k rows ≈ 5×10⁹ pair compares — around the most a single
    * deliberate calibration job should spend; far below any corpus.
    */
  val DefaultMaxExactRows: Long = 100000L

  /** Pass `df` through unchanged after checking the guard.
    *
    * @param what    name of the exact operator (for the error)
    * @param sibling the sub-quadratic sibling to point the caller at
    */
  def check(df: DataFrame, what: String, sibling: String,
            maxExactRows: Long = DefaultMaxExactRows,
            force: Boolean = false): DataFrame = {
    checkCounted(df, what, sibling, maxExactRows, force)
    df
  }

  /** Same guard, but returns the measured row count (−1 when `force`
    * skips the scan) so a dispatcher can reuse the count it already
    * paid for in size-gated planning decisions (e.g. the
    * counted-vs-prefix miner selection in LshDedup.exactJaccardPairs)
    * instead of scanning twice.
    */
  def checkCounted(df: DataFrame, what: String, sibling: String,
                   maxExactRows: Long = DefaultMaxExactRows,
                   force: Boolean = false): Long =
    if (force) -1L
    else {
      val n = df.count()
      if (n > maxExactRows) throw new IllegalArgumentException(
        s"$what is an exact all-pairs (quadratic) ground-truth path and its input has " +
          s"$n rows, above the $maxExactRows-row guard. Use the sub-quadratic sibling " +
          s"($sibling) for production corpora, or pass force=true to run the exact " +
          "path anyway (e.g. on a bounded calibration sample).")
      n
    }
}
