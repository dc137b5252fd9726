package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort-retention and rolling-engagement analytics over an event
  * stream — the activation/retention counterpart of the ordered
  * funnel ([[Funnel]]).
  *
  * Scale design: both operators reduce the fact table to the distinct
  * (user, day) activity grid FIRST — at 100 TB that collapses
  * billions of raw events into at most |users|×|days| rows before any
  * further shuffle, and every aggregate here is partial-aggregatable
  * (map-side combined). Neither operator self-joins the fact table:
  * the classic "events e1 JOIN events e2 ON datediff(...)"
  * formulation is a fact×fact join that does not survive scale.
  */
object Retention {

  /** Day-offset cohort retention: users are cohorted by their first
    * active day; for each requested offset `o`, how many of the
    * cohort were active again exactly `cohort_day + o`.
    *
    * One shuffle on user_id produces (cohort day, active-day set) per
    * user — `min` and `collect_set` both combine map-side, and the
    * set is bounded by the calendar range of the data (days, not
    * events: 365 entries/user/year max), so no window or join over
    * the fact is needed. The per-cohort rollup is a second, tiny
    * shuffle on day.
    */
  def cohortRetention(events: DataFrame, offsets: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ > 0), "offsets must be positive")
    val perUser = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"), collect_set(col("day")).as("days"))
    val offCols = offsets.map(o =>
      sum(when(array_contains(col("days"), date_add(col("cohort_day"), o)), 1L)
        .otherwise(0L)).as(s"d$o"))
    perUser
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_users"), offCols: _*)
  }

  /** Cumulative distinct users to date (the growth curve): a
    * cumulative COUNT(DISTINCT) re-expressed as first-seen day per
    * user (one shuffle on user_id) + per-day new-user counts + a
    * running sum — which runs over the DAY-cardinality frame, so the
    * single-partition window holds one row per calendar day, never
    * per user or per event.
    */
  def cumulativeUsers(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
    // running total with every window partitioned: intra-month
    // cumsum + month-carry theta-join (Ranks.prefixSum) — the day
    // frame never rides a single-partition global window
    Ranks.prefixSum(daily, "day", "new_users",
        date_trunc("month", col("day")), "cum_users")
      .withColumn("cum_users", col("cum_users").cast("long"))
  }

  /** Rolling distinct active users: for each active day, the exact
    * count of distinct users active in the trailing `windowDays`-day
    * window ending that day.
    *
    * A COUNT(DISTINCT) over a sliding frame cannot run as a window
    * function; the scalable exact form inverts it into contributions:
    * each (user, day) activity row contributes to the `windowDays`
    * target days it is visible from (a bounded explode), and the
    * rolling count is then a plain per-day distinct count — fully
    * partial-aggregatable, no self-join, no single-partition window.
    * Rows shuffled = activity × windowDays, independent of raw event
    * count.
    */
  def rollingDistinctUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val contrib = ud.select(col("user_id"),
      explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
        .as("target_day"))
    // report only days that actually appear in the data (a contribution
    // can land past the last active day); the day list is tiny →
    // broadcast semi-join, the contribution frame never re-shuffles
    val days = ud.select(col("day")).distinct()
    contrib
      .join(broadcast(days), contrib("target_day") === days("day"), "left_semi")
      .groupBy(col("target_day").as("day"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }
}
