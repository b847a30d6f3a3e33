package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed token-budget training
  * sequences (the batch-construction step of an LLM data pipeline; no
  * reference counterpart — duva's exports are row-oriented, SURVEY §2.11).
  *
  * Semantics (contiguous fill): documents are laid end-to-end in `idCol`
  * order; a document's `seq_id` is the sequence its FIRST token lands in,
  * i.e. floor(exclusive-prefix-sum(tokens) / budget). A document may
  * overflow its sequence boundary — downstream either truncates at the
  * boundary or packs with overflow, both standard; the assignment itself
  * is what needs the global order.
  *
  * Scale: a naive `sum() OVER (ORDER BY id)` window is a SINGLE-partition
  * sort — a non-starter at 10^9 documents. This is the classic
  * distributed prefix sum instead: range-partition on id (each partition
  * holds a contiguous id range), aggregate one token total per partition
  * (tiny — numPartitions rows to the driver), turn those into exclusive
  * per-partition offsets, and compute the within-partition running sum
  * with a window partitioned BY partition — every partition sorts and
  * scans in parallel, and only numPartitions longs ever leave the
  * executors. Partition boundaries affect intermediate offsets only; the
  * final prefix sum (hence seq_id) is independent of them.
  */
object Pack {

  /** (idCol, n_tokens, seq_id) for every input row; `tokens` is any
    * integral expression (e.g. `TextAnalysis.tokenCount(col("text"))`).
    */
  def packSequences(docs: DataFrame, idCol: String, tokens: Column,
                    budget: Long): DataFrame = {
    require(budget >= 1, s"need budget >= 1; got $budget")
    // range partition: partition p holds ids < partition p+1's ids, and
    // spark_partition_id() is the range rank. Persist so the offsets job
    // and the final pass see the SAME sampled range boundaries.
    val ranged = docs
      // a null token count (null text) reads as 0 tokens: the window sum
      // skips nulls but `start - n_tokens` would be null, silently
      // assigning the doc a null seq_id and dropping it from packing
      .select(col(idCol).as("id"),
        coalesce(tokens.cast("long"), lit(0L)).as("n_tokens"))
      .repartitionByRange(col("id"))
      .withColumn("__part", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = ranged.groupBy(col("__part"))
        // coalesce: a partition whose tokens are all null must contribute
        // 0, not NPE the driver-side getLong
        .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("__t"))
        .collect()
        .map(r => r.getInt(0) -> r.getLong(1))
        .sortBy(_._1)
      // exclusive prefix over the per-partition totals (driver-side:
      // numPartitions entries)
      val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (p, t)) =>
        (p, acc + t)
      }.tail.zip(totals).map { case ((p, end), (_, t)) => (p, end - t) }
      // the offsets rejoin as a broadcast of numPartitions rows — O(1)
      // hash probe per row, where an equivalent nested when() chain is
      // O(numPartitions) branches per row and at thousands of range
      // partitions blows past the codegen method-size limit
      import ranged.sparkSession.implicits._
      val offDf = broadcast(offsets.toSeq.toDF("__part", "__off"))
      val w = Window.partitionBy(col("__part")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val start = sum(col("n_tokens")).over(w) + col("__off") - col("n_tokens")
      val result = ranged.join(offDf, Seq("__part"))
        .select(col("id"), col("n_tokens"),
          floor(start / budget).cast("long").as("seq_id"))
      // materialize while `ranged` is cached: the window must read the
      // SAME partitioning that produced the offsets. The returned frame
      // stays persisted (caller unpersists when done).
      Dedup.eagerly(result, ranged)
    } catch {
      case t: Throwable => ranged.unpersist(blocking = false); throw t
    }
  }
}
