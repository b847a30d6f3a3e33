package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for each left row, the single right row with the
  * greatest timestamp <= the left timestamp, per key. The operator Spark
  * lacks natively (DuckDB `ASOF JOIN`, pandas `merge_asof`, kdb `aj`).
  *
  * Spark-first design (SURVEY.md §2.3 "absent" row): NOT a range join.
  * Both sides are tagged and unioned, shuffled ONCE on the key columns,
  * sorted by (ts, side) within each key, and the right payload is carried
  * forward with a running `last(ignoreNulls)` window — right rows sort
  * before left rows at equal ts, giving inclusive (>=) match semantics.
  * Cost is one shuffle + per-key sort of |L|+|R| rows: no pair blowup,
  * no per-row probe, and partial-agg-free state of O(1) per row, so the
  * plan survives arbitrary scale-up as long as single keys fit a task
  * (skewed hot keys: pre-salt the key and union the salt into `keys`).
  */
object AsOf {

  /** Join `left` to the latest `right` row with `right.rightTs <=
    * left.leftTs` on equal `keys`. Output = every left column plus
    * `prefix + c` for each requested right column (null when no right row
    * precedes). Ties on (key, ts): among right rows the one sorting last
    * by `rightCols` wins — pre-aggregate the right side to unique
    * (key, ts) when exact tie semantics matter.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    // the tie-break window orders by the right payload struct; map-typed
    // columns are unorderable and would die in analysis with an error
    // naming no operator — fail here with the fix (pre-aggregate to
    // unique (key, ts), or carry the map via a joined-back id)
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    rightCols.foreach { c =>
      require(!hasMap(right.schema(c).dataType),
        s"joinAsOf right column '$c' contains a map type, which cannot " +
          "order the tie-break window — pre-aggregate the right side to " +
          "unique (key, ts) and carry the map by id instead")
    }
    val leftCols = left.columns.toSeq
    val lType = StructType(leftCols.map(c => left.schema(c)))
    val rType = StructType(rightCols.map(c => right.schema(c)))

    val l = left.select(
      keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(rType).as("__r"): _*)
    // SQL comparison semantics: a right row with NULL ts never satisfies
    // leftTs >= rightTs, so it must not enter the carry-forward window
    // (nulls-first ordering would otherwise make it the "preceding" match
    // for every left row). Left rows with NULL ts sort before all right
    // rows and correctly get a null match.
    // NULL join keys never match under equi semantics (DuckDB ASOF JOIN
    // and merge_asof agree), but partitionBy groups null keys together —
    // null-keyed RIGHT rows must therefore stay out of the union, or a
    // null-keyed left row would "match" them; with them gone it gets the
    // correct null match from its empty carry-forward window.
    val rightKeyed =
      if (keys.isEmpty) right else right.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val r = rightKeyed.filter(col(rightTs).isNotNull).select(
      keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(lType).as("__l") :+
        struct(rightCols.map(col): _*).as("__r"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }
}

/** Range (interval) join without equi keys — pairs (l, r) with
  * `l.ts` in `[r.start, r.end)`. Spark's only native plan for a pure
  * inequality join is BroadcastNestedLoopJoin (O(|L|·|R|) compares, build
  * side fully broadcast). The scale path bins the time axis: each
  * interval replicates to the bins it overlaps, each left row lands in
  * exactly one bin, and the join becomes an equi-join on bin followed by
  * the exact range filter — shuffle-partitionable on both sides,
  * replication factor = interval length / binSeconds (size `binSeconds`
  * to the typical interval). Matches are emitted exactly once (a left
  * row's bin intersects each overlapping interval's bin list once).
  */
object RangeJoin {

  def joinRange(left: DataFrame, leftTs: String,
                right: DataFrame, startCol: String, endCol: String,
                binSeconds: Long): DataFrame = {
    val binMicros = binSeconds * 1000000L
    val lb = left.withColumn("__bin", floor(unix_micros(col(leftTs)) / binMicros))
    // interval [start, end) overlaps bins floor(start/b) .. floor((end-1µs)/b)
    // inverted/degenerate intervals (end <= start) must match NOTHING:
    // sequence(a, b) with b < a steps -1 and would enumerate ~every bin
    // between the two timestamps DESCENDING — one malformed row exploding
    // into millions of elements. when() yields null there; explode drops
    // the row.
    val startBin = floor(unix_micros(col(startCol)) / binMicros)
    val endBin = floor((unix_micros(col(endCol)) - 1) / binMicros)
    val rb = right.withColumn("__bin",
      explode(when(endBin >= startBin, sequence(startBin, endBin))))
    lb.join(rb, Seq("__bin"))
      .filter(col(leftTs) >= col(startCol) && col(leftTs) < col(endCol))
      .drop("__bin")
  }
}
