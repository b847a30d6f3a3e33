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
    // internal aliases are positional, so profiled column names never
    // enter a parsed expression string (a name with a quote or backtick
    // would break a selectExpr-built unpivot); input references are
    // backtick-quoted since col() itself parses attribute names
    def in(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = count(lit(1)).cast("long").as("n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(in(c)).cast("long").as(s"nn__$i"),
        round(min(in(c)), 4).cast("double").as(s"mn__$i"),
        round(max(in(c)), 4).cast("double").as(s"mx__$i"),
        countDistinct(in(c)).cast("long").as(s"nd__$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col"), col("n"), col(s"nn__$i").as("n_nonnull"),
        col(s"mn__$i").as("min_v"), col(s"mx__$i").as("max_v"),
        col(s"nd__$i").as("n_distinct"))
    }: _*)
    one.select(explode(entries).as("e")).select(col("e.*"))
  }
}
