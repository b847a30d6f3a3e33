package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window/top-k/sessionization operators.
  *
  * The reference's "latest artifact" semantics are latest-by-overwrite
  * (app/crud/crud_hyperfile.py:49-53) — the real relational meaning is
  * top-1-per-key by recency, which we implement properly. The cron
  * full-refresh tick (app/jobs/scheduler.py:10,76-89) maps to tumbling
  * time windows in batch and Trigger.ProcessingTime in streaming.
  *
  * Scale posture: every operator here shuffles exactly once on its
  * partition key; rank windows sort per-key, never globally. Top-k with a
  * global order uses orderBy().limit(k), which Spark executes as per-
  * partition top-k + a k-row driver merge (TakeOrderedAndProject) — no full
  * sort at 100 TB.
  */
object Windows {

  /** W1: latest row per key (deterministic: ties broken by `tieBreak`).
    *
    * Formulated as `max_by(row, (ts, tieBreak))` — an algebraic aggregate
    * with map-side partial combine, so at most ONE row per key per input
    * partition reaches the shuffle. The rank-window formulation
    * ([[latestPerKeyWindow]]) shuffles and sorts EVERY row; at 100 TB of
    * events that difference is the whole job.
    */
  def latestPerKey(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(col(keyCol))
      .agg(max_by(payload, struct(col(tsCol), col(tieBreak))).as("__top"))
      .select(df.columns.map(c => col(s"__top.$c").as(c)): _*)
  }

  /** Rank-window formulation of [[latestPerKey]] (general top-n shape;
    * kept as the reference implementation the aggregate form is verified
    * against, and the template for n > 1).
    */
  def latestPerKeyWindow(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(tieBreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** W2: global top-k under an explicit order. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Top-k rows per key, LARGEST first by `orderCols` (lexicographic).
    * Uses a bounded-priority-queue aggregate (CollectTopK) with map-side
    * partial combine: each input partition contributes at most k rows per
    * key to the shuffle — unlike a rank window, which shuffles and sorts
    * everything. The generalization of [[latestPerKey]] to n > 1.
    */
  def topKPerKey(df: DataFrame, keyCol: String, orderCols: Seq[String], k: Int): DataFrame = {
    val payload = struct(
      (orderCols ++ df.columns.filterNot(orderCols.contains)).map(col): _*)
    df.groupBy(col(keyCol))
      .agg(org.apache.spark.sql.graftshim.Shim.collectTopK(payload, k, reverse = false)
        .as("__top"))
      .select(explode(col("__top")).as("__row"))
      .select(df.columns.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** T1 batch analog: tumbling windows by truncating the timestamp. */
  def tumbling(tsCol: Column, unit: String): Column = date_trunc(unit, tsCol)

  /** Sessionization (batch analog of session windows): a session starts at
    * the first event per key or after a gap > `gapSeconds`. Returns the
    * input plus `session_id` (1-based per key). Single shuffle on the key;
    * the lag/cumsum windows reuse the same partitioning (one sort).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
                 gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val prevTs = lag(unix_micros(col(tsCol)), 1).over(byKey)
    val isStart = when(
      prevTs.isNull || (unix_micros(col(tsCol)) - prevTs) > gapSeconds * 1000000L, 1
    ).otherwise(0)
    df.withColumn("__start", isStart)
      .withColumn("session_id", sum(col("__start")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__start")
  }
}
