package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable interval (range) join: match left rows whose timestamp
  * falls inside right-side [start, end) intervals, with optional
  * equality keys.
  *
  * A naive `l JOIN r ON l.ts >= r.start AND l.ts < r.end` plans as a
  * nested-loop (O(n·m)) unless one side broadcasts. The standard scale
  * trick: quantize time into `grainSeconds` buckets, explode each
  * interval into the grains it covers, equi-join on (keys, grain) —
  * Catalyst plans a plain hash/sort-merge join — then re-apply the
  * exact range predicate. Cost: one shuffle + an expansion factor of
  * ceil(interval/grain) on the (smaller) interval side; pick the grain
  * near the typical interval length.
  */
object RangeJoin {

  def intervalJoin(left: DataFrame, ltsCol: String,
                   right: DataFrame, startCol: String, endCol: String,
                   keyCols: Seq[String], grainSeconds: Long): DataFrame = {
    require(grainSeconds > 0)
    val lg = left.withColumn("__grain",
      expr(s"unix_timestamp($ltsCol) div $grainSeconds"))
    val rg = right.withColumn("__grain", explode(sequence(
      expr(s"unix_timestamp($startCol) div $grainSeconds"),
      // end is exclusive: the last covered grain is (end - 1s)'s grain
      expr(s"unix_timestamp($endCol - INTERVAL 1 SECOND) div $grainSeconds"))))
    lg.join(rg, keyCols :+ "__grain")
      .filter(col(ltsCol) >= col(startCol) && col(ltsCol) < col(endCol))
      .drop("__grain")
  }
}
