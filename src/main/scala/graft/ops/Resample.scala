package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a dense
  * per-key calendar and forward-fill the gaps (LOCF) — the standard
  * prep step before any per-period comparison, trend, or feature
  * window over irregular event data (no reference counterpart — duva
  * exports the raw stream; SURVEY §2.11).
  *
  * Scale posture: the day spine is generated per key from that key's
  * [min, max] day via `sequence` + `explode` — output rows ∝ key-count
  * × calendar span, never ∝ event count, and generation is distributed
  * (no driver calendar). The spine⋈daily join keys on (key, day) like
  * any co-keyed equi-join, and LOCF is ONE key-partitioned window —
  * keys are independent, so the whole op is embarrassingly parallel
  * across the key space at any corpus size.
  */
object Resample {

  /** Dense daily series per key: `valueAgg` aggregates each key's
    * events within a day; missing days appear with the last seen value
    * (`v_ff`, null until the key's first observed day) and `filled` =
    * 1. `day` is a DATE column.
    */
  def gapFillDaily(events: DataFrame, keyCol: String, tsCol: String,
                   valueAgg: Column): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).cast("date").as("day"))
      // __obs marks the day as OBSERVED: the filled flag must key off
      // the spine-join miss, not v's null-ness — a day whose events all
      // carry null values is observed data, not a calendar gap
      .agg(valueAgg.as("v"), max(lit(1)).as("__obs"))
    val spine = daily
      .groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day")))
          .as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        last(col("v"), ignoreNulls = true).over(w).as("v_ff"),
        when(col("__obs").isNull, lit(1)).otherwise(lit(0)).as("filled"))
  }
}
