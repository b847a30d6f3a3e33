package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Mergeable frequency sketches (Cormode & Muthukrishnan 2005,
  * "An Improved Data Stream Summary: The Count-Min Sketch").
  *
  * The sketch here is RELATIONAL: `d × w` (row, bucket) cells whose
  * values are plain sums — so Spark's map-side combine IS the sketch
  * merge (each partition builds its partial sketch locally and the
  * shuffle moves at most `d·w` cells per partition, never the corpus),
  * and two sketches union by adding cells. At 100 TB the frequency
  * profile of any keyed column costs one narrow scan plus a `d·w`-sized
  * aggregate, and daily sketches roll up into monthly ones by cell-wise
  * addition instead of re-scanning history.
  *
  * Hashing is md5-derived (row j hashes `j:value`), so the sketch is a
  * pure function of the data — engine-portable and exactly replayable
  * by the DuckDB oracle. Estimates are the classic min-over-rows upper
  * bound: `est(x) = min_j cell[j][h_j(x)] ≥ true(x)`, within
  * `ε·N` of the truth with probability `1 − δ` for `w = ⌈e/ε⌉`,
  * `d = ⌈ln 1/δ⌉`.
  */
object Sketch {

  /** `h_j(value)` — md5-uniform bucket of `value` under hash row `j`. */
  def cmsBucket(value: Column, j: Column, w: Int): Column =
    conv(substring(md5(concat(j.cast("string"), lit(":"),
      value.cast("string"))), 1, 8), 16, 10).cast(LongType) % w

  /** The `d × w` sketch of `valueCol`'s frequencies: one row per
    * non-empty cell, `(j, bucket, cnt)`. One corpus scan, exploded ×d
    * (d is 4-ish — a constant-factor projection, not a blowup), one
    * map-side-combined aggregate whose output is ≤ `d·w` rows.
    */
  def cmsSketch(df: DataFrame, valueCol: String, d: Int, w: Int): DataFrame =
    // nulls are EXCLUDED by contract (here and in every probe path): a
    // null value hashes to a null bucket no estimate join can reach, so
    // leaving them in would silently break the one-sided error bound
    // (cms_est >= n) for the null group — the sketch's domain is the
    // NON-NULL values, stated rather than accidental
    df.filter(col(valueCol).isNotNull)
      .select(explode(array((0 until d).map(lit): _*)).as("j"),
        col(valueCol).as("__v"))
      .select(col("j"), cmsBucket(col("__v"), col("j"), w).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))

  /** [[cmsSketch]] from a pre-aggregated `(value, weight)` frame — cell
    * values are IDENTICAL (a cell's count over raw occurrences equals
    * the weight-sum over distinct values), but the ×d explode runs over
    * the vocabulary instead of the corpus. When a frequency table
    * already exists (or the caller needs truth next to the estimate
    * anyway), this halves the corpus scans and shrinks the exploded
    * side by the corpus/vocabulary ratio.
    */
  def cmsSketchWeighted(freq: DataFrame, valueCol: String, weightCol: String,
                        d: Int, w: Int): DataFrame =
    freq.filter(col(valueCol).isNotNull).select(col(valueCol).as("__v"), col(weightCol).as("__n"),
        explode(array((0 until d).map(lit): _*)).as("j"))
      .select(col("j"), cmsBucket(col("__v"), col("j"), w).as("bucket"),
        col("__n"))
      .groupBy("j", "bucket").agg(sum(col("__n")).as("cnt"))

  /** Point estimates for a candidate frame of values (one column named
    * `valueCol`): `min_j cell[j][h_j(x)]`. The sketch side is `d·w`
    * rows → broadcast; candidates never shuffle. Values the sketch
    * never saw still land in buckets (estimate = that bucket's noise
    * floor) — the CMS one-sided error contract.
    */
  def cmsEstimate(candidates: DataFrame, valueCol: String,
                  sketch: DataFrame, d: Int, w: Int): DataFrame =
    candidates
      .filter(col(valueCol).isNotNull) // sketch domain excludes nulls
      .select(col(valueCol), explode(array((0 until d).map(lit): _*)).as("j"))
      .withColumn("bucket", cmsBucket(col(valueCol), col("j"), w))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col(valueCol))
      .agg(min(col("cnt")).as("cms_est"))

  /** Heavy-hitter report over `valueCol`: every distinct value's true
    * count next to its sketch estimate (`cms_est ≥ n` always; equality
    * when the value's buckets saw no collisions). The demo/oracle path
    * derives candidates from the same frame; a production monitor keeps
    * only the sketch and probes it with last period's heavy hitters.
    */
  /** [[cmsHeavyHitters]] over an EXISTING frequency table — the real
    * production shape: at corpus scale the `(value, n)` table is a
    * materialized artifact anyway (a published extract, a cached stage),
    * and this variant adds zero corpus scans and pins nothing. `freq`
    * feeds three vocabulary-sized branches (weighted sketch, estimate
    * probe, report join); hand it a materialized frame or accept
    * recomputation of its plan.
    */
  def cmsHeavyHittersFromFreq(freq: DataFrame, valueCol: String, nCol: String,
                              d: Int = 4, w: Int = 64): DataFrame = {
    val sketch = cmsSketchWeighted(freq, valueCol, nCol, d, w)
    cmsEstimate(freq.select(col(valueCol)), valueCol, sketch, d, w)
      .join(freq, Seq(valueCol))
      .select(col(valueCol), col(nCol).as("n"), col("cms_est"),
        (col("cms_est") - col(nCol)).as("overcount"))
  }

  def cmsHeavyHitters(df: DataFrame, valueCol: String,
                      d: Int = 4, w: Int = 64): DataFrame =
    cmsHeavyHittersManaged(df, valueCol, d, w)._1

  /** [[cmsHeavyHitters]] with an explicit lifetime: the corpus is
    * scanned ONCE into a vocabulary-sized frequency leaf that backs all
    * three branches, the REPORT is materialized from it, and the
    * frequency leaf is released before returning — so one call pins
    * exactly one vocabulary-sized leaf (the report itself), returned as
    * the second element for caller-side `unpersist`. A per-period
    * monitor unpersists it after publishing each report; without that a
    * cached leaf would accumulate per call (they'd age out of the disk
    * cache only via LRU). Monitors that already keep a materialized
    * frequency table should call [[cmsHeavyHittersFromFreq]], which
    * pins nothing.
    */
  def cmsHeavyHittersManaged(df: DataFrame, valueCol: String,
                             d: Int = 4, w: Int = 64)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val (truth, truthRdd) = Dedup.materializeLeaf(
      df.groupBy(col(valueCol)).agg(count(lit(1)).as("n")))
    try Dedup.materializeLeaf(cmsHeavyHittersFromFreq(truth, valueCol, "n", d, w))
    finally truthRdd.unpersist(blocking = false)
  }
}
