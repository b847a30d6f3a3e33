package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: scalable fuzzy (edit-distance) joins.
  *
  * The naive fuzzy join is a cross product with a levenshtein filter —
  * n·m distance evaluations, dead at corpus scale. The standard linkage
  * plan is BLOCK → VERIFY, the same shape as every banded pipeline here
  * (MinHash/SimHash/LSH): a cheap equi-join key (blocking) restricts
  * candidates, the exact predicate verifies only those. Cost follows
  * block collisions, never n·m; the join shuffles on the block key like
  * any equi-join, so it co-partitions and skew-salts with the standard
  * machinery.
  *
  * Blocking recall is an explicit, documented tradeoff (as in every
  * production linkage system): a match whose edits fall inside the
  * blocking prefix lands in different blocks and is missed. Callers
  * needing higher recall union several blocking passes (prefix, suffix,
  * sorted-token prefix) — each pass is this same operator.
  */
object Linkage {

  /** Edit-distance join of `left` and `right` on their text columns:
    * candidates share a lowercased `prefixLen`-char block key and sit
    * within `maxDist` of each other in length (a length gap > maxDist
    * already implies distance > maxDist — free pre-pruning); survivors
    * verify with exact levenshtein ≤ `maxDist`. Output: left columns,
    * right columns, and the distance.
    *
    * Both sides are projected through [[blockKey]]; the equi-join on
    * the key is the ONLY shuffle. The levenshtein verify is Spark's
    * codegen'd built-in — no UDF.
    *
    * UNICODE contract: distance counts CODEPOINTS (Spark's levenshtein
    * — "café"→"cafe" is 1 edit), the semantics a linkage user expects.
    * Discovered in the r10 cross-engine sweep: DuckDB's levenshtein
    * counts BYTES (the same pair scores 2), so the DuckDB oracle for
    * q_fuzzy_join is valid only on its ASCII fixture domain where the
    * two definitions coincide; the codepoint behavior itself is pinned
    * engine-side by ExtensionsSpec ("fuzzy join edit distance counts
    * codepoints").
    *
    * SCALE KNOB — `lengthBand`: a `prefixLen`-char prefix alone carries
    * fixed entropy, so at corpus scale each block grows ∝ corpus and
    * candidate pairs ∝ block² — the quadratic the blocking was meant to
    * kill sneaks back through block growth. `lengthBand = w` (require
    * w > maxDist) folds the length band INTO the shuffle key:
    * candidates must share (prefix, length-band), where ONE side emits
    * its own band plus both neighbors (|len_a − len_b| ≤ maxDist
    * < w ⟹ the bands differ by at most 1, so every surviving pair
    * still shares a key — zero recall change, same final rows). The
    * neighbor expansion is side-symmetric, so it lands on whichever
    * input the optimizer estimates SMALLER — the 3× shuffle-volume cost
    * buys blocks cut to their band slice without ever tripling the big
    * side (callers need not order their arguments). The exact length
    * filter and the levenshtein verify are unchanged. 0 (default) =
    * prefix-only blocking.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftText: String, rightText: String,
                maxDist: Int, prefixLen: Int = 3,
                lengthBand: Int = 0): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1: $prefixLen")
    require(lengthBand == 0 || lengthBand > maxDist,
      s"lengthBand must be 0 (off) or > maxDist: $lengthBand vs $maxDist")
    // DATAFRAME-qualified references, not bare col(): when both sides
    // share the text column name — the normal linkage case (two
    // customer tables, self-linkage) — bare names are AMBIGUOUS after
    // the join and the operator would throw on exactly its primary
    // use case
    // ALIAS-qualified references, not df(col) handles: when left and
    // right are the SAME DataFrame (true self-linkage), df-handle refs
    // share one lineage and either throw AMBIGUOUS_SELF_JOIN or both
    // resolve to the left side (levenshtein(x, x) = 0 for every
    // candidate pair) — the standard a/b alias pattern disambiguates
    val lBase = left.withColumn("__bk", blockKey(col(leftText), prefixLen))
    val rBase = right.withColumn("__bk2", blockKey(col(rightText), prefixLen))
    val (l, r, keyCond) =
      if (lengthBand == 0)
        (lBase.alias("__fzl"), rBase.alias("__fzr"),
          col("__fzl.__bk") === col("__fzr.__bk2"))
      else {
        val band = (c: Column) => floor(length(c) / lengthBand)
        val neighbors = (c: Column) =>
          explode(array(band(c) - 1, band(c), band(c) + 1))
        // the ±1 expansion is side-symmetric (each pair still meets on
        // the un-exploded side's single band value — also why no pair
        // can match twice), so explode whichever input the optimizer
        // estimates smaller; ties (both unknown) keep the right side
        val explodeLeft =
          left.queryExecution.optimizedPlan.stats.sizeInBytes <
            right.queryExecution.optimizedPlan.stats.sizeInBytes
        val lb = lBase.withColumn("__band",
          if (explodeLeft) neighbors(col(leftText)) else band(col(leftText)))
          .alias("__fzl")
        val rb = rBase.withColumn("__band2",
          if (explodeLeft) band(col(rightText)) else neighbors(col(rightText)))
          .alias("__fzr")
        (lb, rb, col("__fzl.__bk") === col("__fzr.__bk2") &&
          col("__fzl.__band") === col("__fzr.__band2"))
      }
    val lt = col(s"__fzl.$leftText")
    val rt = col(s"__fzr.$rightText")
    // THRESHOLDED verify: levenshtein(l, r, k) early-exits the moment
    // the distance must exceed k — O(len·k) per pair instead of the
    // unbounded form's O(len²). On long linkage strings (full
    // addresses, document heads) the verify is the per-candidate cost,
    // and k is small by construction; survivors' distances are the true
    // distances (the -1 overflow sentinel only marks rejected pairs),
    // so results are bit-identical to the unbounded form
    l.join(r, keyCond && abs(length(lt) - length(rt)) <= maxDist)
      .withColumn("dist", levenshtein(lt, rt, maxDist))
      .filter(col("dist") >= 0)
      .drop("__bk", "__bk2", "__band", "__band2")
  }

  /** The blocking key: lowercased first `prefixLen` characters. A pure
    * narrow expression — usable as a bucketing/partition key when the
    * linkage runs repeatedly over the same corpus (write once, join
    * co-partitioned forever, the q_curation_bucketed lever).
    */
  def blockKey(text: Column, prefixLen: Int): Column =
    lower(substring(text, 1, prefixLen))
}
