package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history — the versioned evolution
  * of the reference's overwrite-per-sync model: where duva's every sync
  * REPLACES the extract (CreateMode.CREATE_AND_REPLACE,
  * app/core/importer.py:242-249) and history is lost, a type-2 build
  * keeps one row per (key, value-run) with a validity interval, so any
  * past state can be reconstructed with a point-in-time predicate.
  *
  * Plan shape: change detection (lag + row_number, one window), filter
  * to run-opening rows, interval close (lead, second window over the
  * SAME key partitioning on the ~runs-sized survivor set). One shuffle
  * on the full log, one on the (much smaller) run set; no self-join, no
  * driver state. At 100 TB both windows partition on the dimension key
  * — per-key event counts are the only per-task memory bound.
  */
object Scd {

  /** Collapse an event log to type-2 history rows: one row per run of
    * equal `tracked` values within a `keys` group ordered by `order`.
    * Output: keys ++ tracked ++ (valid_from, valid_to = next run's
    * valid_from or null, is_current).
    *
    * `order` must be a deterministic total order within each key group
    * (tie-break with a unique id column). A null tracked value opens and
    * closes runs like any other value (null-safe comparison), and the
    * first row of a key always opens a run. `carry` columns are taken
    * from each run's OPENING row (e.g. the opening event id — also the
    * natural unique output sort key when valid_from can tie).
    */
  def type2History(events: DataFrame, keys: Seq[String], order: Seq[Column],
                   tracked: Seq[String], validFrom: Column,
                   carry: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty && tracked.nonEmpty,
      s"type2History needs keys, order and tracked columns " +
        s"(got ${keys.size}/${order.size}/${tracked.size}) — " +
        "an empty tracked list would die with a bare empty.reduce")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val changed = tracked
      .map(c => !(lag(col(c), 1).over(w) <=> col(c)))
      .reduce(_ || _)
    // row 1 of each group must open its run even when its tracked value
    // is null (lag-null <=> null is TRUE, so `changed` alone misses it)
    val opens = changed || row_number().over(w) === 1
    val runs = events
      .withColumn("__ord", struct(order: _*)) // order tuple as one sortable col
      .withColumn("__open", opens)
      .filter(col("__open"))
      .select((keys ++ tracked ++ carry).map(col) ++
        Seq(validFrom.as("valid_from"), col("__ord")): _*)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col("__ord"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__ord")
  }

  /** Point-in-time read of a [[type2History]] table: each key's state AS
    * OF instant `at` (the run whose validity interval covers it). A pure
    * filter — pushes into the history extract's scan, so a snapshot
    * query reads only matching row groups.
    */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
