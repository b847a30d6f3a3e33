package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned extract publishing: snapshot isolation for a lake the
  * reference's replace-the-world refresh cannot give.
  *
  * The reference rebuilds its single extract in place on every sync
  * (CREATE_AND_REPLACE, app/core/importer.py:242-249) — safe for Hyper's
  * single-file swap, but a multi-file 100 TB parquet extract has readers
  * MID-SCAN while the refresh deletes and rewrites the files under them.
  * Here every publish lands in a fresh immutable `v=N` directory and the
  * only mutation is an atomic pointer flip (`_LATEST` written to a temp
  * name, then renamed — rename is atomic on HDFS/local): a reader that
  * resolved the pointer before the flip finishes its scan on untouched
  * files; one that resolves after sees the complete new version. Rollback
  * is the same pointer flip to an older, still-present version — no data
  * movement, instant. Old versions are pruned explicitly ([[vacuum]]),
  * never implicitly, so the retention window is an operator decision.
  */
object Versioned {

  private val Latest = "_LATEST"

  private def versionDir(root: String, v: Long) = s"$root/v=$v"

  /** Versions currently present on storage, ascending. */
  def listVersions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, p) = Refresh.hfs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
  }

  /** The version the `_LATEST` pointer names, if published. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, _) = Refresh.hfs(spark, root)
    val ptr = new Path(root, Latest)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  private def flipPointer(spark: SparkSession, root: String, v: Long): Unit = {
    val (fs, _) = Refresh.hfs(spark, root)
    val tmp = new Path(root, s"$Latest.tmp")
    val ptr = new Path(root, Latest)
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // rename with OVERWRITE replaces the pointer in ONE atomic op —
    // a delete-then-rename pair would leave a window with NO pointer,
    // during which a reader's currentVersion resolves to nothing
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Publish `df` as the next version and flip `_LATEST` to it; returns
    * the new version number. The data write happens entirely BEFORE the
    * flip — a crash mid-write leaves a dangling unreferenced directory
    * (re-publishable or vacuumable), never a broken pointer.
    */
  def publish(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val next = listVersions(spark, root).lastOption.getOrElse(0L) + 1L
    df.write.mode("errorifexists").parquet(versionDir(root, next))
    flipPointer(spark, root, next)
    next
  }

  /** Read the version `_LATEST` points at (the only read path normal
    * consumers use).
    */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no published version under $root"))
    spark.read.parquet(versionDir(root, v))
  }

  /** Time travel: read an explicit version that is still on storage. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(listVersions(spark, root).contains(v), s"version $v not present under $root")
    spark.read.parquet(versionDir(root, v))
  }

  /** Point `_LATEST` back at an older (still-present) version — instant,
    * no data movement.
    */
  def rollback(spark: SparkSession, root: String, v: Long): Unit = {
    require(listVersions(spark, root).contains(v), s"cannot roll back to absent version $v")
    flipPointer(spark, root, v)
  }

  /** Delete versions older than `keep` trailing ones, never touching the
    * pointed-at version. Explicit retention: at 100 TB, stale snapshots
    * are the storage bill, but deleting one a reader still scans is an
    * outage — the operator picks the window.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least one version")
    val (fs, _) = Refresh.hfs(spark, root)
    val vs = listVersions(spark, root)
    val current = currentVersion(spark, root)
    val deletable = vs.dropRight(keep).filterNot(current.contains)
    deletable.foreach(v => fs.delete(new Path(versionDir(root, v)), true))
    deletable
  }
}
