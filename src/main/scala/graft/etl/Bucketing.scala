package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed extracts — the shuffle-elimination lever for repeated
  * co-keyed work at 100 TB. A fact table that is joined/aggregated on
  * the same key every sync (duva re-export joins each sync,
  * app/core/importer.py:242-249 rebuilds relationships per tick) should
  * be WRITTEN pre-hashed into N buckets on that key: every later
  * equi-join between two tables bucketed on the join key (same N), and
  * every aggregation on the bucket key, then runs with ZERO Exchange —
  * the most expensive operator in any big plan is paid once at write
  * time instead of per query.
  *
  * Spark bucketing lives in the session catalog (`bucketBy` requires
  * `saveAsTable`), so this sits in the DDL layer next to [[Ddl]]: the
  * extract is a managed table under the warehouse dir; address it by
  * name.
  */
object Bucketing {

  /** Write `df` as managed parquet table `table`, hash-bucketed on
    * `bucketCols` into `numBuckets` files per partition, each sorted on
    * `sortCols` (defaults to the bucket cols — sorted buckets also give
    * SortMergeJoin its order for free).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val sort = if (sortCols.nonEmpty) sortCols else bucketCols
    val spark = df.sparkSession
    // STAGED swap, mirroring Refresh.swapInto's posture: the new data is
    // fully written to a staging TABLE before the old one is touched —
    // dropping the target first would destroy the only copy if the write
    // fails (or if df READS from the table being replaced, the normal
    // re-bucket/compact shape). Crash windows: before the staging commit
    // the old table is intact; between drop and rename the new data
    // exists complete under the staging name.
    def clearStaleLocation(name: String): Unit = {
      // an in-memory session catalog forgets tables across JVMs while
      // their warehouse files survive; clear a stale location or the
      // CREATE path of saveAsTable refuses it (LOCATION_ALREADY_EXISTS).
      // PARSE the name — TableIdentifier(name) would treat "db.t" as one
      // undotted name and resolve <warehouse>/db.t instead of the real
      // <warehouse>/db.db/t, leaving the true stale location in place
      val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog
        .defaultTablePath(spark.sessionState.sqlParser.parseTableIdentifier(name)))
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) { fs.delete(loc, true); () }
    }
    val staging = table + "__staging"
    Ddl.dropTable(spark, staging)
    clearStaleLocation(staging)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
      .saveAsTable(staging)
    Ddl.dropTable(spark, table)
    clearStaleLocation(table)
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    ()
  }

  /** The bucketed table as a DataFrame (bucketing metadata attached, so
    * joins/aggs on the bucket key plan without an Exchange).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
