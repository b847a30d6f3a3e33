package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew/scale utilities: the techniques that keep keyed operations healthy
  * at 100 TB when key distributions are not (SURVEY.md §7.4 posture).
  *
  * AQE's skew-join splitting handles most runtime skew; these are the
  * explicit, plan-level tools for when the skew is known in advance or
  * the operation (stateful agg, non-AQE-eligible join) needs it.
  */
object Scale {

  /** Deterministic salt in [0, n) derived from `entropy` (any column with
    * per-row spread, e.g. the row's unique id). Deterministic — replays
    * and retries salt identically, unlike rand().
    */
  def salt(entropy: Column, n: Int): Column = {
    // pmod(x, 0) is NULL and explode(array()) is zero rows — n = 0 would
    // silently EMPTY a salted join instead of failing; fail fast here,
    // the one place every salted path flows through
    require(n >= 1, s"salt fan-out must be >= 1, got $n")
    pmod(xxhash64(entropy), lit(n.toLong))
  }

  /** DISTRIBUTED global running sum — the scale-safe replacement for
    * `sum(v) OVER (ORDER BY ...)`, which Spark plans as a SINGLE-
    * partition window (every row through one task: the straggler that
    * kills a global sweep at 100 TB). The Pack prefix-sum recipe,
    * generalized: range-partition on the order columns (each partition
    * holds a contiguous key range; equal keys co-locate), aggregate one
    * per-partition total (numPartitions longs to the driver), turn those
    * into exclusive offsets, and compute the within-partition running
    * sum with a window partitioned BY partition — every partition sorts
    * and scans in parallel. Equal-key ties contribute in arbitrary
    * relative order — exactly like the single-partition window, whose
    * tie order is equally arbitrary; reads at run boundaries are
    * identical either way.
    *
    * Returns the input columns plus `outCol` (LongType running sum,
    * ties resolved by the given order). The distributed form is
    * MATERIALIZED (the offsets job and the final pass must see the same
    * sampled range boundaries) and stays persisted; callers running many
    * pipelines should unpersist it when done.
    *
    * ADAPTIVE like [[saltedJoin]]: when the input's optimizer estimate
    * fits the session's broadcast threshold, a single-partition window
    * over a frame that small is harmless and the distributed machinery
    * (a range shuffle + a totals job + an eager materialization) would
    * cost more than it saves — so the plain global window is planned,
    * row-identical by construction. The distributed path engages exactly
    * when one task could NOT hold the stream. `forceDistributed = true`
    * exercises the distributed plan regardless (tests, known-bad
    * estimates).
    */
  def rangedRunningSum(df: DataFrame, orderCols: Seq[String],
                       value: Column, outCol: String,
                       forceDistributed: Boolean = false): DataFrame = {
    val threshold =
      org.apache.spark.sql.graftshim.Shim.autoBroadcastThreshold(df.sparkSession)
    val inBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (!forceDistributed && threshold > 0 && inBytes <= threshold) {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(orderCols.map(col): _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      return df.withColumn(outCol,
        sum(coalesce(value.cast("long"), lit(0L))).over(w))
    }
    val inCols = df.columns.toSeq
    val ranged = df
      .withColumn("__v", coalesce(value.cast("long"), lit(0L)))
      .repartitionByRange(orderCols.map(col): _*)
      .withColumn("__part", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = ranged.groupBy(col("__part"))
      .agg(coalesce(sum(col("__v")), lit(0L)).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (p, t)) =>
      (p, acc + t)
    }.tail.zip(totals).map { case ((p, end), (_, t)) => (p, end - t) }
    import df.sparkSession.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__part", "__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__part")).orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val result = ranged.join(offDf, Seq("__part"))
      .select(inCols.map(col) :+
        (sum(col("__v")).over(w) + col("__off")).as(outCol): _*)
    Dedup.eagerly(result, ranged)
  }

  /** Two-stage salted aggregation: partial-aggregate on (keys, salt) —
    * splitting each hot key across `n` reducers — then final-aggregate on
    * keys. `partialAggs` and `finalAggs` must compose (sum/sum,
    * count/sum, min/min, ...). For algebraic aggregates Spark's map-side
    * combine usually suffices; this is for the cases where one reducer
    * key still overflows a task (extreme hot keys, memory-heavy buffers).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], entropy: Column, n: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(entropy, n))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** The diagnose half of the diagnose→treat loop with [[saltedJoin]]:
    * one skew-audit scan of `df` on the join keys, returning the salt
    * fan-out the HOTTEST key needs — `ceil(maxKeyCount · nKeys / total)`,
    * i.e. how many subkeys spread that key's rows back to the mean key
    * load (the per-key `salt_factor` the q_skew_audit query reports,
    * taken at its max). Uniform keys audit to 1 (salting would buy
    * nothing); a key holding half the corpus audits to ~nKeys/2.
    *
    * Cost: one map-side-combined groupBy on the keys and a 1-row
    * aggregate — the same shape as the audit query, safe to run ahead
    * of any 100 TB join. The result is driver-sized (one Int).
    *
    * The fan-out is CAPPED at the cluster's task parallelism: on a
    * heavy-tailed distribution (one key far above the mean across
    * millions of distinct keys) the back-to-mean formula can recommend
    * 10^4–10^5 subkeys, and [[saltedJoin]] replicates the whole small
    * side once per subkey — spreading one key's rows over more tasks
    * than the cluster can run concurrently buys nothing while the
    * replication cost keeps growing. Parallelism-many subkeys already
    * let the hot key occupy every task slot.
    */
  def saltFactorFor(df: DataFrame, keys: Seq[String]): Int = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    val row = counts.agg(max(col("__n")).as("__mx"),
      sum(col("__n")).as("__tot"), count(lit(1)).as("__nk")).head()
    if (row.isNullAt(0)) 1 // empty input: any fan-out is a no-op; keep 1
    else {
      val wanted = math.max(1L, math.ceil(
        row.getLong(0).toDouble * row.getLong(2) / row.getLong(1)).toLong)
      val cap =
        math.max(1, df.sparkSession.sparkContext.defaultParallelism)
      math.min(wanted, cap.toLong).toInt
    }
  }

  /** [[saltedJoin]] with the fan-out chosen BY the audit instead of a
    * caller guess: `n = saltFactorFor(large, keys)`. The audit scan only
    * runs when the join would actually shuffle (a broadcast-size small
    * side skips straight to the broadcast plan, where salting is moot).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 entropy: Column, joinType: String): DataFrame = {
    val threshold =
      org.apache.spark.sql.graftshim.Shim.autoBroadcastThreshold(large.sparkSession)
    val smallBytes = small.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && smallBytes <= threshold)
      saltedJoin(large, small, keys, entropy, n = 1, joinType)
    else
      saltedJoin(large, small, keys, entropy,
        n = saltFactorFor(large, keys), joinType, forceSalt = true)
  }

  /** Skew-safe equi-join of a large skewed side against a small side:
    * the large side gets a deterministic salt, the small side is
    * replicated once per salt value, and the join key becomes
    * (keys, salt) — so a hot key's rows spread over `n` tasks instead of
    * one straggler. Result is row-identical to the unsalted join.
    *
    * Salting only pays under a SHUFFLE join — a broadcast join never
    * shuffles the probe side, so there is no reducer skew to fix, and
    * replicating the build side `n`× before broadcasting it just inflates
    * the broadcast and its hash table `n`×. So when the small side's
    * optimizer estimate fits the session's broadcast threshold, this
    * plans the plain broadcast join (identical rows); the salted path
    * engages exactly when the join would shuffle. Pass `forceSalt = true`
    * to exercise the salted plan regardless (tests, known-bad estimates).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 entropy: Column, n: Int, joinType: String = "inner",
                 forceSalt: Boolean = false): DataFrame = {
    // the small side is REPLICATED n× under the salt: join types that
    // preserve unmatched SMALL-side rows (right/full outer) would emit
    // each such row once per replica — n duplicates the unsalted join
    // never produces. Types preserving only the large side are safe
    // (each large row carries exactly one salt).
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
        "semi", "anti", "cross").contains(jt),
      s"saltedJoin cannot preserve unmatched small-side rows " +
        s"(joinType '$joinType' would emit them once per salt replica); " +
        "swap the sides or use the unsalted join")
    val threshold =
      org.apache.spark.sql.graftshim.Shim.autoBroadcastThreshold(large.sparkSession)
    val smallBytes = small.queryExecution.optimizedPlan.stats.sizeInBytes
    if (!forceSalt && threshold > 0 && smallBytes <= threshold)
      large.join(broadcast(small), keys, joinType)
    else {
      val saltedLarge = large.withColumn("__salt", salt(entropy, n))
      val replicated = small.withColumn("__salt", explode(
        array((0 until n).map(i => lit(i.toLong)): _*)))
      saltedLarge.join(replicated, keys :+ "__salt", joinType).drop("__salt")
    }
  }
}
