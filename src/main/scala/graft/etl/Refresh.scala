package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
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

  /** Resolve the Hadoop FileSystem for `path` — extracts live wherever
    * the URI scheme says (`file://`, `hdfs://`, `s3a://`, ...), never on
    * the driver's local disk specifically.
    */
  private[graft] def hfs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Swap a fully-written `staging` directory into place at `target`:
    * move the current extract (if any) aside, rename staging in, drop the
    * old copy. Each rename is atomic on HDFS/local filesystems, so a
    * crash at any point leaves a COMPLETE extract either at `target`, at
    * `target__old` (recoverable), or in staging — never a partial mix,
    * and the data is written exactly once (no second Spark rewrite). On
    * object stores rename is a server-side copy; prefer the direct
    * `mode("overwrite")` commit path of [[overwrite]] there.
    */
  private[graft] def swapInto(fs: FileSystem, staging: Path, target: Path): Unit = {
    val old = new Path(target.toString + "__old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target))
      require(fs.rename(target, old), s"rename $target -> $old failed")
    require(fs.rename(staging, target), s"rename $staging -> $target failed")
    fs.delete(old, true)
  }

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
    * The merged frame is materialized into a staging directory (the plan
    * reads the path being replaced) and then renamed into place — the
    * data is written once, not rewritten.
    */
  def incremental(spark: SparkSession, delta: DataFrame, extractPath: String,
                  keys: Seq[String]): Long = {
    val (fs, target) = hfs(spark, extractPath)
    val merged =
      if (!fs.exists(target)) delta
      else graft.catalog.Catalog.upsert(spark.read.parquet(extractPath), delta, keys)
    val staging = new Path(extractPath + "__staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    swapInto(fs, staging, target)
    spark.read.parquet(extractPath).count()
  }

  /** Compact an extract to ~`targetFileBytes` parquet files. Incremental
    * refresh ticks accrete small files; at cluster scale the resulting
    * task explosion and namenode/list pressure dominate read cost. One
    * `coalesce` (narrow — no shuffle) to ceil(bytes/target) partitions
    * written to staging AT the final layout (so `targetFileBytes` above
    * the read-split size is honored — no second rewrite to re-split it),
    * then renamed into place via [[swapInto]]. Sizing uses the recursive
    * content summary, so hive-partitioned layouts are measured too; the
    * compacted OUTPUT is a flat layout — re-partition via
    * [[overwrite]](..., partitionByCols) if the extract must stay
    * hive-partitioned.
    */
  def compact(spark: SparkSession, extractPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val (fs, target) = hfs(spark, extractPath)
    val bytes = fs.getContentSummary(target).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val staging = new Path(extractPath + "__compact")
    spark.read.parquet(extractPath).coalesce(parts)
      .write.mode("overwrite").parquet(staging.toString)
    swapInto(fs, staging, target)
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
