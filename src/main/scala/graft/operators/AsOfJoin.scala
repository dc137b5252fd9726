package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: attach to every left row the most recent
  * right row with right.ts ≤ left.ts within the same key — "what was
  * the last candle/quote when this event happened", the canonical
  * time-series join Spark lacks as a built-in.
  *
  * Built by composition (the brief's preference order: compose before
  * custom plans): tag both sides, union, and carry right-side values
  * forward with an ignore-nulls last() over (key, ts, side). That is
  * ONE shuffle on (key) with a spillable sort — the same cost profile
  * a native as-of merge join would have — and it inherits AQE, codegen
  * and spill behavior for free. A range-partitioned merge
  * implementation only wins when one side is drastically smaller;
  * that case is `broadcast(right)` + a window, same composition.
  *
  * Contract: `right` carries the same key column names as `left`, a
  * ts column with the same name, and the value columns to attach;
  * attached columns come back as `asof_<name>`. Ties (right.ts ==
  * left.ts) match (inclusive), like SQL `ASOF JOIN ... ON l.ts >=
  * r.ts`. Left rows with no prior right row get NULLs.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   tsCol: String): DataFrame = {
    val valueCols = right.columns.filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    require(valueCols.nonEmpty, "right side has no value columns to attach")
    require(valueCols.forall(c => !left.columns.contains(c)),
      s"right value columns ${valueCols.mkString(",")} collide with left")
    // the output/internal names must be free too, or a left column
    // would be silently overwritten instead of rejected
    val reserved = valueCols.map(c => s"asof_$c") :+ "__side"
    require(reserved.forall(c => !left.columns.contains(c)),
      s"left columns collide with as-of output/internal names: " +
        reserved.filter(left.columns.contains).mkString(","))

    val taggedRight = right
      .select((keyCols :+ tsCol).map(col) ++ valueCols.map(c => col(c).as(s"asof_$c")): _*)
      .withColumn("__side", lit(0))
    val taggedLeft = left.withColumn("__side", lit(1))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // right rows (__side 0) sort before left rows at equal ts ⇒ a right
    // row at exactly left.ts is visible to it (inclusive semantics)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
