package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A 100 TB extract queried by TWO dimensions at once (length × token
  * count, time × key, lat × lon) cannot be partition-pruned by a plain
  * single-column layout: sorting by one dimension scatters the other.
  * Interleaving the bits of both dimensions (the Morton / Z-order curve)
  * keeps points close in BOTH dimensions close on the curve, so
  *
  *  - partitioning by the curve's high bits (a quadtree cell) lets a
  *    2-D box query statically prune to the cells the box intersects —
  *    an `IN` filter on the partition column, resolved at planning
  *    time, no directory beyond those cells ever listed;
  *  - sorting WITHIN each file by the full curve key clusters parquet
  *    row groups, so min/max stats prune inside the surviving files.
  *
  * This is the "OPTIMIZE ZORDER BY" layout lever, built from plain
  * shift/mask/or arithmetic (codegen-friendly, engine-portable — the
  * oracle can re-derive every key). Write once, prune forever: the
  * cluster key costs one repartition at publish time and nothing at
  * read time.
  */
object Layout {

  /** Morton interleave of two non-negative integer columns over their
    * low `bits` bits each: x occupies even bit positions, y odd. Values
    * ≥ 2^bits wrap (only their low bits participate) — safe for box
    * queries whose bounds stay below 2^bits, because a wrapped row can
    * only land in a FALSE-POSITIVE cell (the post-scan box predicate
    * drops it), never escape a cell the box covers.
    */
  def zorder2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Scala mirror of [[zorder2]] for constant cell coordinates. */
  private def interleave(cx: Long, cy: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((cx >> i) & 1L) << (2 * i)) | (((cy >> i) & 1L) << (2 * i + 1)))
      .reduce(_ | _)

  /** The quadtree cells (z-bucket ids) intersecting the box
    * [x0,x1]×[y0,y1] under a `bits`-bit curve bucketed to its top 2k
    * bits: the cross product of the two cell-coordinate ranges. Pure
    * constant arithmetic on the query box — no data touched, no driver
    * action; the result feeds a static partition `IN` filter.
    */
  def cellsForBox(x0: Long, x1: Long, y0: Long, y1: Long,
                  bits: Int, k: Int): Seq[Long] = {
    require(k >= 1 && k <= bits, s"k out of range: $k")
    val s = bits - k
    for {
      cx <- (x0 >> s) to (x1 >> s)
      cy <- (y0 >> s) to (y1 >> s)
    } yield interleave(cx, cy, k)
  }

  /** Write `df` Z-clustered on (xCol, yCol): directory-partitioned by
    * the curve's top-2k-bit cell, rows within each file sorted by the
    * full curve key (row-group clustering). One repartition on the cell
    * key — the entire cost of the layout.
    */
  def writeZClustered(df: DataFrame, xCol: String, yCol: String,
                      bits: Int, k: Int, path: String): Unit = {
    // cellsForBox validates k <= bits at QUERY time; the write paths
    // must too — a negative shift is masked mod 64 by shiftright, every
    // coordinate collapses to ~0, and the garbage layout publishes
    // silently, only failing when the first box query runs
    require(k >= 1 && k <= bits, s"need 1 <= k <= bits, got k=$k bits=$bits")
    val s = bits - k
    val withBucket = df.withColumn("zbucket",
      zorder2(shiftright(col(xCol).cast("long"), s),
        shiftright(col(yCol).cast("long"), s), k))
    withBucket
      .repartition(col("zbucket"))
      .sortWithinPartitions(zorder2(col(xCol), col(yCol), bits))
      .write.mode("overwrite").partitionBy("zbucket").parquet(path)
    // an empty corpus writes zero partition dirs — leave the layout
    // readable as an empty table (see Refresh.ensureReadable)
    graft.etl.Refresh.ensureReadable(df.sparkSession, path, withBucket.schema)
  }

  /** Incremental upsert into a [[writeZClustered]] layout, keyed on
    * `keyCol` — the layout twin of the streaming ANN index's cell-scoped
    * upsert ([[graft.streaming.Streams.annIndexUpsert]]): a 100 TB
    * layout cannot be rewritten per refresh, so this touches ONLY the
    * cells the delta lands in PLUS the cells updated keys are moving
    * out of (a re-scored doc can change its (x, y) — the stale row in
    * the old cell must go). Old homes come from a NARROW (key, zbucket)
    * column scan (data columns never read); touched cells are rewritten
    * via dynamic partition overwrite (re-sorted on the curve key, so
    * intra-file clustering survives the merge), and a touched cell left
    * empty is deleted explicitly (dynamic overwrite cannot drop a
    * partition it has no rows for). The rewrite is ∝ touched cells'
    * population, never the layout.
    */
  def upsertZClustered(spark: SparkSession, delta: DataFrame, keyCol: String,
                       xCol: String, yCol: String, bits: Int, k: Int,
                       path: String): Unit = {
    require(k >= 1 && k <= bits, s"need 1 <= k <= bits, got k=$k bits=$bits")
    val s = bits - k
    // null keys/coords would poison the keyed merge; duplicate keys in
    // ONE delta keep a single arbitrary row (last-wins callers attach a
    // version column and pre-reduce) — annIndexUpsert's contract.
    val cleaned = delta.filter(col(keyCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .dropDuplicates(keyCol)
    val assigned = cleaned.withColumn("zbucket",
      zorder2(shiftright(col(xCol).cast("long"), s),
        shiftright(col(yCol).cast("long"), s), k))
    CellUpsert.upsert(spark, assigned, keyCol, "zbucket", path,
      sortWithin = Some(zorder2(col(xCol), col(yCol), bits)))
  }

  /** 2-D box query over a [[writeZClustered]] layout: a static `IN`
    * filter on the cell partition column prunes every non-intersecting
    * cell at the source (planning-time, PlanSpec-pinned), and the exact
    * box predicate drops the surviving cells' out-of-box rows. Rows
    * whose coordinates exceed 2^bits can only appear as false positives
    * (see [[zorder2]]) — the box predicate is therefore applied to BOTH
    * coordinates unconditionally.
    */
  def boxQuery(spark: SparkSession, path: String,
               xCol: String, yCol: String,
               x0: Long, x1: Long, y0: Long, y1: Long,
               bits: Int, k: Int): DataFrame = {
    val cells = cellsForBox(x0, x1, y0, y1, bits, k)
    spark.read.parquet(path)
      .filter(col("zbucket").isin(cells: _*))
      .filter(col(xCol) >= x0 && col(xCol) <= x1 &&
        col(yCol) >= y0 && col(yCol) <= y1)
  }
}
