package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** User-journey analytics over an event stream — the reporting queries an
  * analytics engine serves on top of its event extracts (the reference's
  * submission-event streams, `app/models`): ordered-step funnels and
  * weekly cohort retention.
  *
  * Both are pure DataFrame aggregations: no driver-side state, no
  * collect, every shuffle keyed on the user column.
  */
object Behavior {

  /** Ordered-step funnel: for each prefix of `steps`, the number of users
    * who completed every step of the prefix IN ORDER — each step strictly
    * after that user's earliest completion of the previous prefix (the
    * standard "first qualifying occurrence" funnel semantics).
    *
    * Output: (step INT, event_type, users) — one row per step, users
    * non-increasing down the funnel.
    *
    * Scale posture: stage i is a keyed equi-join between the events
    * filtered to that step's type (a pushed-down predicate — 1/k of the
    * stream reaches the join) and the previous stage's per-user earliest
    * times (≤ one row per user), followed by a map-side-combined `min`.
    * k steps = k keyed joins; nothing is collected, no window over the
    * whole stream, no per-user event sorting. At 100 TB the per-stage
    * user table is the small side and broadcasts once it fits.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def stepEvents(st: String) =
      events.filter(col(typeCol) === st)
        .select(col(userCol).as("user"), col(tsCol).as("__ts"))

    var reached = stepEvents(steps.head)
      .groupBy(col("user")).agg(min(col("__ts")).as("__t"))
    var out = reached.agg(count(lit(1)).as("users"))
      .select(lit(1).cast(IntegerType).as("step"),
        lit(steps.head).as("event_type"), col("users"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = stepEvents(st)
        .join(reached, "user")
        .filter(col("__ts") > col("__t"))
        .groupBy(col("user")).agg(min(col("__ts")).as("__t"))
      out = out.unionByName(
        reached.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).cast(IntegerType).as("step"),
            lit(st).as("event_type"), col("users")))
    }
    out
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of their
    * FIRST event; for each (cohort_week, week_offset) cell, the number of
    * distinct users from that cohort active in that week.
    *
    * Output: (cohort_week DATE, week_offset INT, n_users). Offset 0 is
    * the cohort's own week; both sides are Monday-truncated so the day
    * difference is always an exact multiple of 7.
    *
    * Scale posture: first-seen is one user-keyed min; the activity table
    * is the distinct (user, week) projection — events collapse to at most
    * users × active-weeks rows BEFORE the join, so the retention join
    * never sees the raw stream. Both shuffles key on user.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol).as("user"))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    val activity = events.select(col(userCol).as("user"),
      date_trunc("week", col(tsCol)).cast("date").as("activity_week")).distinct()
    activity.join(firsts, "user")
      .groupBy(col("cohort_week"),
        (datediff(col("activity_week"), col("cohort_week")) / 7)
          .cast(IntegerType).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
