package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many users
  * progressed view → click → purchase IN ORDER (each later stage
  * strictly after the user's earliest qualifying earlier stage).
  *
  * Scale design: one hash exchange on user_id — the stage timestamps
  * are running-min window columns over the same (user_id, ts)
  * ordering, and the per-user rollup reuses the window's
  * partitioning, so Spark plans window + aggregate over a single
  * shuffle of the fact table. No self-joins (the naive formulation
  * joins events to events per stage — at 100 TB that is three fact
  * shuffles and two fact×fact joins).
  */
object Funnel {

  /** Per-user funnel timestamps: first view, first click strictly
    * after that view, first purchase strictly after that click.
    */
  def userStages(events: DataFrame,
                 stages: Seq[String] = Seq("view", "click", "purchase"))
  : DataFrame = {
    require(stages.length == 3, "userStages expects exactly 3 stage names")
    val Seq(s1, s2, s3) = stages
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // running min of the first-stage timestamp up to (and including)
    // the current row; a second-stage event qualifies only if STRICTLY
    // later than that running min — and so on up the funnel. Staged
    // through withColumn (a window result feeds the next window's
    // argument); all three windows share one partitioning, so the
    // plan is a single exchange.
    events
      .withColumn("__cum1",
        min(when(col("event_type") === s1, col("ts"))).over(w))
      .withColumn("__s2",
        when(col("event_type") === s2 && col("ts") > col("__cum1"), col("ts")))
      .withColumn("__cum2", min(col("__s2")).over(w))
      .withColumn("__s3",
        when(col("event_type") === s3 && col("ts") > col("__cum2"), col("ts")))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === s1, col("ts"))).as("t_" + s1),
        min(col("__s2")).as("t_" + s2),
        min(col("__s3")).as("t_" + s3))
  }

  /** Funnel report by first-stage cohort day: users entering the
    * funnel that day, and how many of them converted through each
    * later stage (in order). Tiny aggregate output.
    */
  def report(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase"))
  : DataFrame = {
    val Seq(s1, s2, s3) = stages
    userStages(events, stages)
      .filter(col("t_" + s1).isNotNull)
      .groupBy(to_date(col("t_" + s1)).cast("string").as("cohort_day"))
      .agg(count(lit(1)).as("n_" + s1),
        count(col("t_" + s2)).as("n_" + s2),
        count(col("t_" + s3)).as("n_" + s3))
  }
}
