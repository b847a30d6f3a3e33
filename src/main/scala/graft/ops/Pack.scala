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
                    budget: Long): DataFrame =
    assignByPrefix(docs, idCol, tokens, budget, Nil)

  /** The distributed prefix-sum assignment shared by [[packSequences]]
    * and [[shardManifest]]; `extra` columns ride the range partitioning
    * unchanged and come back beside (id, n_tokens, seq_id).
    */
  private[graft] def assignByPrefix(docs: DataFrame, idCol: String, tokens: Column,
                             budget: Long, extra: Seq[Column],
                             startOffset: Long = 0L): DataFrame = {
    require(budget >= 1, s"need budget >= 1; got $budget")
    // range partition: partition p holds ids < partition p+1's ids, and
    // spark_partition_id() is the range rank. Persist so the offsets job
    // and the final pass see the SAME sampled range boundaries.
    val ranged = docs
      // a null token count (null text) reads as 0 tokens: the window sum
      // skips nulls but `start - n_tokens` would be null, silently
      // assigning the doc a null seq_id and dropping it from packing
      .select(col(idCol).as("id") +:
        coalesce(tokens.cast("long"), lit(0L)).as("n_tokens") +: extra: _*)
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
      val start = sum(col("n_tokens")).over(w) + col("__off") - col("n_tokens") +
        lit(startOffset)
      val keep = ranged.columns.filterNot(_ == "__part").map(col).toSeq
      val result = ranged.join(offDf, Seq("__part"))
        .select(keep :+ floor(start / budget).cast("long").as("seq_id"): _*)
      // materialize while `ranged` is cached: the window must read the
      // SAME partitioning that produced the offsets. The returned frame
      // stays persisted (caller unpersists when done).
      Dedup.eagerly(result, ranged)
    } catch {
      case t: Throwable => ranged.unpersist(blocking = false); throw t
    }
  }

  /** Modulus of the manifest checksum: 31-bit prime, so per-doc residues
    * are < 2³⁰ and a shard's plain BIGINT sum stays exact (no ANSI
    * overflow) up to ~2³³ docs per shard — unreachable, since the token
    * budget bounds a shard's doc count long before that. Caveat: the
    * budget bound assumes docs carry >= 1 token; null/empty-text rows
    * coalesce to 0 tokens and do NOT advance the prefix sum, so a run of
    * zero-token docs lands in one shard without consuming budget. The sum
    * only goes inexact past ~8.6 billion zero-token docs in a single
    * shard — not a corpus any pipeline ships — but the exactness claim
    * is conditional on that, not on the budget alone.
    */
  val ChecksumPrime = 1000000007L

  /** Training-ingest shard manifest — the handoff artifact between the
    * curation pipeline and the training job (webdataset/Megatron-style):
    * documents are laid end-to-end in id order and cut into shards of
    * `shardTokens` tokens by the SAME contiguous-fill rule as
    * [[packSequences]] (a doc belongs to the shard its first token lands
    * in), then each shard gets one manifest row:
    *
    *   shard_id, n_docs, n_tokens, first/last doc id, checksum
    *
    * The checksum is order-insensitive content integrity: per-doc 60-bit
    * md5 digest of `id ":" text`, reduced mod [[ChecksumPrime]], summed,
    * reduced again — a trainer re-reading the shard recomputes it from
    * the rows it actually got, so a dropped/duplicated/bit-flipped doc
    * surfaces before a single gradient step. Modular sums commute, so
    * the check never needs the read order to match the write order.
    *
    * Scale: the assignment is [[packSequences]]'s distributed prefix sum
    * (numPartitions longs to the driver, everything else parallel); the
    * manifest itself is one shard-keyed aggregation with full map-side
    * combine, output = corpus_tokens / shardTokens rows.
    */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
                    tokens: Column, shardTokens: Long): DataFrame =
    shardManifestFrom(docs, idCol, textCol, tokens, shardTokens, 0L)

  private def docDigest(idCol: String, textCol: String): Column =
    conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        coalesce(col(textCol), lit("")))), 1, 15), 16, 10)
      .cast("long") % ChecksumPrime

  private def shardManifestFrom(docs: DataFrame, idCol: String,
                                textCol: String, tokens: Column,
                                shardTokens: Long,
                                startOffset: Long): DataFrame = {
    val assigned = assignByPrefix(docs, idCol, tokens, shardTokens,
      Seq(docDigest(idCol, textCol).as("__d")), startOffset)
    try {
      val m = assigned.groupBy(col("seq_id").as("shard_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          min(col("id")).as("first_doc_id"),
          max(col("id")).as("last_doc_id"),
          (sum(col("__d")) % ChecksumPrime).as("checksum"))
      // materialize the manifest, then release the assignment cache that
      // packSequences hands back still-persisted
      Dedup.eagerly(m, assigned)
    } catch {
      case t: Throwable => assigned.unpersist(blocking = false); throw t
    }
  }

  /** Fold one append-only batch of documents into the manifest at
    * `path` — the incremental form of [[shardManifest]] and the batch
    * body of [[graft.streaming.Streams.shardManifestStream]]. The
    * modular checksum is exactly what makes this possible: folding a
    * batch into the last (still-open) shard is `(old + new) mod p`,
    * bit-identical to recomputing the shard whole, so the streamed
    * manifest equals the batch manifest over the union corpus at every
    * commit (the spec pins that equality).
    *
    * Contract: the corpus is an append-only LEDGER in id order — a
    * batch's ids must exceed everything already folded. Rows at or
    * below the manifest's high-water id are DROPPED as replays, which
    * is what makes a crash-replayed foreachBatch micro-batch (the
    * exactly-once gap foreachBatch leaves open) a clean no-op: the
    * previous fold committed atomically via the staged swap, so a
    * replay's ids are all ≤ the high-water mark. Rewriting history
    * (re-chunking, mid-stream edits) is a [[shardManifest]] rebuild by
    * design, exactly like the index streams' retrain contract.
    *
    * Cost per fold: the batch's own prefix-sum assignment + one
    * manifest-sized merge (manifest rows = corpus_tokens/shardTokens,
    * never corpus-sized); the swap is two atomic renames
    * ([[graft.etl.Refresh.swapInto]], crash-recoverable).
    */
  def shardManifestUpsert(spark: org.apache.spark.sql.SparkSession,
                          batch: DataFrame, path: String, idCol: String,
                          textCol: String, tokens: Column,
                          shardTokens: Long): Unit = {
    import graft.etl.Refresh
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Refresh.recoverHalfSwap(fs, hPath)
    val prior: Option[DataFrame] =
      if (fs.exists(hPath)) Some(spark.read.parquet(path)) else None
    val (priorTokens, highWater) = prior match {
      case None => (0L, Long.MinValue)
      case Some(p) =>
        val r = p.agg(coalesce(sum("n_tokens"), lit(0L)),
          coalesce(max("last_doc_id"), lit(Long.MinValue)),
          coalesce(min("shard_tokens"), lit(shardTokens)),
          coalesce(max("shard_tokens"), lit(shardTokens))).head()
        // shard ids computed at one granularity numerically collide with
        // ids computed at another — a misconfigured restart must refuse
        // loudly, not merge unrelated boundaries (the index streams'
        // refuse-the-skip-artifact contract)
        require(r.getLong(2) == shardTokens && r.getLong(3) == shardTokens,
          s"manifest at $path was built with shardTokens=${r.getLong(2)}; " +
            s"refusing to fold a $shardTokens-token batch into it — " +
            "re-granulating is a shardManifest rebuild by design")
        (r.getLong(0), r.getLong(1))
    }
    val fresh = batch.filter(col(idCol) > highWater)
    if (fresh.isEmpty) return // pure replay (or empty batch): a no-op
    val batchManifest = shardManifestFrom(fresh, idCol, textCol, tokens,
      shardTokens, startOffset = priorTokens)
    try {
      val merged = prior.map(_.drop("shard_tokens").unionByName(batchManifest))
        .getOrElse(batchManifest)
        .groupBy("shard_id")
        .agg(sum("n_docs").as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          min("first_doc_id").as("first_doc_id"),
          max("last_doc_id").as("last_doc_id"),
          (sum("checksum") % ChecksumPrime).as("checksum"))
        // the persisted manifest records its own granularity so the
        // guard above can refuse a drifted restart
        .withColumn("shard_tokens", lit(shardTokens))
      val staging = new org.apache.hadoop.fs.Path(path + "__staging")
      if (fs.exists(staging)) fs.delete(staging, true)
      merged.write.mode("overwrite").parquet(staging.toString)
      Refresh.swapInto(fs, staging, hPath)
    } finally batchManifest.unpersist(blocking = false)
  }
}
