package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Full-refresh columnar extract writer.
  *
  * The reference's single data product is a columnar extract rebuilt from
  * scratch on every sync: `CreateMode.CREATE_AND_REPLACE` + SQL `COPY`
  * (reference: app/core/importer.py:242-256), returning the imported row
  * count. Spark-native equivalent: `mode("overwrite").parquet` — an atomic
  * replace commit via the output committer, so the reference's per-file
  * Redis sync lock (app/utils/onadata_utils.py:203) is unnecessary.
  *
  * Scale posture: `partitionByCols` lets callers lay the extract out as
  * `(server_id, form_id, sync_date)` hive partitions so downstream reads
  * prune; the count is taken from the written files' parquet footers
  * (a metadata-only scan — no data re-read).
  */
object Refresh {

  /** Overwrite `path` with `df` as parquet and return the row count of the
    * written extract (read back, as the reference's COPY count does).
    */
  def overwrite(df: DataFrame, path: String,
                partitionByCols: Seq[String] = Nil): Long = {
    val w = df.write.mode("overwrite")
    val w2 = if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w
    w2.parquet(path)
    // count() over freshly-written parquet is served from footer row-group
    // metadata (no column data is scanned).
    df.sparkSession.read.parquet(path).count()
  }

  /** Full-refresh pipeline: read → overwrite extract → count. */
  def fullRefresh(spark: SparkSession, source: DataFrame, extractPath: String): Long =
    overwrite(source, extractPath)

  /** Incremental refresh: MERGE the delta into the extract by key —
    * incoming rows win on key collision, absent keys append. The scale
    * alternative to the reference's rebuild-everything tick: cost ∝
    * |extract| + |delta| (one anti-join shuffle) instead of a full
    * re-export, and late data still lands because every tick re-merges.
    * The merged frame must be materialized before the overwrite commit
    * (the plan reads the path being replaced).
    */
  def incremental(spark: SparkSession, delta: DataFrame, extractPath: String,
                  keys: Seq[String]): Long = {
    val exists = new java.io.File(extractPath).exists()
    val merged =
      if (!exists) delta
      else graft.catalog.Catalog.upsert(spark.read.parquet(extractPath), delta, keys)
    val staging = extractPath + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    val committed = spark.read.parquet(staging)
    committed.write.mode("overwrite").parquet(extractPath)
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(staging))
    spark.read.parquet(extractPath).count()
  }

  /** Compact an extract to ~`targetFileBytes` parquet files. Incremental
    * refresh ticks accrete small files; at cluster scale the resulting
    * task explosion and namenode/list pressure dominate read cost. One
    * `coalesce` (narrow — no shuffle) to ceil(bytes/target) partitions,
    * staged rewrite, atomic replace.
    */
  def compact(spark: SparkSession, extractPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val fs = new java.io.File(extractPath)
    val bytes = Option(fs.listFiles()).map(_.filter(_.isFile)
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum).getOrElse(0L)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val staging = extractPath + "__compact"
    spark.read.parquet(extractPath).coalesce(parts)
      .write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite").parquet(extractPath)
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(staging))
    spark.read.parquet(extractPath).count()
  }

  /** Overwrite `path` range-sorted on `sortCols`: rows are range-
    * partitioned then sorted within each file, so every file covers a
    * disjoint key range and parquet min/max footer stats let selective
    * readers skip whole files/row groups — the poor man's clustered
    * index for the extract, at zero read-side cost.
    */
  def overwriteSorted(df: DataFrame, path: String, sortCols: Seq[String],
                      numFiles: Int = 0): Long = {
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, cols: _*)
      else df.repartitionByRange(cols: _*)
    ranged.sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path).count()
  }
}
