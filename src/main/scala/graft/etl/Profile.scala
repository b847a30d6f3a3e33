package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the pre-flight a schema-inferring ETL engine runs
  * before committing to a layout (the reference infers types per sync
  * from the whole CSV, app/core/importer.py:54-74; profiling is the same
  * scan made explicit and reusable).
  *
  * ONE aggregation over the input computes every requested column's
  * stats (map-side partial combine; the multi-distinct is planned via
  * Expand — at extreme scale swap `countDistinct` for
  * `approx_count_distinct`), then `stack` unpivots the single result row
  * to long form without touching the driver.
  */
object Profile {

  /** Per-column profile (rows, non-null, min, max, distinct) in long form
    * (one output row per column). Values rounded to 4dp for cross-engine
    * comparability.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("n") +: cols.flatMap { c =>
      Seq(count(col(c)).cast("long").as(s"nn__$c"),
        round(min(col(c)), 4).cast("double").as(s"mn__$c"),
        round(max(col(c)), 4).cast("double").as(s"mx__$c"),
        countDistinct(col(c)).cast("long").as(s"nd__$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', n, `nn__$c`, `mn__$c`, `mx__$c`, `nd__$c`")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (col, n, n_nonnull, min_v, max_v, n_distinct)")
  }
}
