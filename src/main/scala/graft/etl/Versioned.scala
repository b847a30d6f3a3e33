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
  * only mutations are two atomic renames: the commit manifest and the
  * `_LATEST` pointer flip. A reader that resolved the pointer before the
  * flip finishes its scan on untouched files; one that resolves after
  * sees the complete new version. Rollback is the same pointer flip to an
  * older, still-present version — no data movement, instant. Old versions
  * are pruned explicitly ([[vacuum]]), never implicitly, so the retention
  * window is an operator decision.
  *
  * ==Commit manifests==
  * A version EXISTS iff `_manifests/v=N.manifest` exists — one small file
  * per publish listing the version's data files, committed by an atomic
  * no-overwrite rename AFTER the data write completes. Readers resolve
  * versions entirely from the manifest tree: [[readVersion]] opens one
  * manifest (O(1), no directory listing of the data tree — on an object
  * store, LIST over millions of data objects is the latency and cost
  * killer) and hands Spark the explicit file list; [[listVersions]] lists
  * only the tiny `_manifests/` directory. A crash between data write and
  * manifest rename leaves an uncommitted orphan directory that no reader
  * can ever observe; [[vacuum]] reclaims it. The manifest also enables
  * partial-file GC: any file in the data tree not named by its version's
  * manifest (a dead speculative-task leftover, a crashed writer's debris)
  * is invisible to readers and safe to delete.
  *
  * FORMAT BREAK vs pre-manifest roots: versions published before the
  * manifest era have no `_manifests` entry, so manifest-era readers don't
  * see them. Run [[migrate]] once per legacy root before anything else —
  * especially before [[vacuum]], whose orphan GC otherwise reclaims them
  * (the pointed-at version is always exempt as a safety net).
  *
  * ==Concurrency==
  * Single concurrent WRITER per extract root is the supported regime
  * (mirror of the reference's one-sync-at-a-time scheduler lock,
  * app/utils/onadata_utils.py). The design still fails safe if two race:
  * both may stage data, but the no-overwrite manifest rename is the
  * single commit point — exactly one wins version N, the loser throws
  * and its staged directory is vacuumable. Readers need no lock ever.
  */
object Versioned {

  private val Latest = "_LATEST"
  private val ManifestsDir = "_manifests"
  private val ManifestRe = """^v=(\d+)\.manifest$""".r
  private val DataDirRe = """^v=(\d+)$""".r

  private def versionDir(root: String, v: Long) = s"$root/v=$v"
  private def manifestPath(root: String, v: Long) =
    new Path(s"$root/$ManifestsDir", s"v=$v.manifest")

  /** Committed versions, ascending — from the manifest tree only (one
    * listing of a directory holding one small file per version). Stray
    * non-matching names (`v=tmp`, editor droppings) are ignored, never
    * parse errors.
    */
  def listVersions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, _) = Refresh.hfs(spark, root)
    val mdir = new Path(root, ManifestsDir)
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).toSeq.map(_.getPath.getName)
      .collect { case ManifestRe(v) => v.toLong }.sorted
  }

  /** Staged `v=N` data directories, committed or not — WRITER-side only
    * ([[publish]] must never reuse a crashed publish's number; readers
    * never call this).
    */
  private def stagedVersions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, p) = Refresh.hfs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .collect { case DataDirRe(v) => v.toLong }.sorted
  }

  private val TagLine = "#tag="
  private val TsLine = "#ts="

  private def manifestLines(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val (fs, _) = Refresh.hfs(spark, root)
    val mp = manifestPath(root, v)
    require(fs.exists(mp), s"version $v not committed under $root")
    val in = fs.open(mp)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
      .split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
    finally in.close()
  }

  /** The data files version `v` committed, as recorded by its manifest. */
  def manifestFiles(spark: SparkSession, root: String, v: Long): Seq[String] =
    manifestLines(spark, root, v).filterNot(_.startsWith("#"))

  /** The idempotency tag version `v` was committed under, if any. */
  def tagOf(spark: SparkSession, root: String, v: Long): Option[String] =
    manifestLines(spark, root, v).find(_.startsWith(TagLine)).map(_.stripPrefix(TagLine))

  /** The committed version carrying `tag` — the writer-side idempotency
    * probe: a retried publish (streaming batch replay after a crash)
    * asks this before publishing again. Resolution order:
    *
    *  1. the tag→version INDEX pointer ([[commitManifest]] writes one
    *     per tagged commit): one pointer read + one manifest existence
    *     check — O(1) at ANY history depth, full-history answer. The
    *     pointer is verified (stored tag equality, manifest present)
    *     before being trusted, so an MD5 collision or a vacuumed
    *     version falls through rather than lying.
    *  2. fallback newest-`lookback` manifest scan, for roots whose
    *     tagged commits predate the index (or a crash between manifest
    *     and pointer renames). A tag older than the window is reported
    *     absent on this path — callers needing full pre-index history
    *     pass `lookback = Int.MaxValue`.
    */
  def versionForTag(spark: SparkSession, root: String, tag: String,
                    lookback: Int = 64): Option[Long] = {
    val (fs, _) = Refresh.hfs(spark, root)
    val ptr = tagPointerPath(root, tag)
    val viaIndex =
      if (!fs.exists(ptr)) None
      else {
        val in = fs.open(ptr)
        val txt =
          try new String(org.apache.commons.io.IOUtils.toByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        val nl = txt.indexOf('\n')
        val (vStr, storedTag) =
          if (nl < 0) (txt, "") else (txt.take(nl), txt.drop(nl + 1))
        vStr.trim.toLongOption
          .filter(_ => storedTag == tag) // MD5 collision guard
          .filter(v => fs.exists(manifestPath(root, v)) &&
            tagOf(spark, root, v).contains(tag)) // vacuumed/stale guard
      }
    viaIndex.orElse(
      listVersions(spark, root).reverse.take(math.max(lookback, 1))
        .find(v => tagOf(spark, root, v).contains(tag)))
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

  /** Atomically commit version `v`'s manifest. The rename does NOT
    * overwrite: if a racing writer already committed `v`, this throws and
    * the caller's staged data stays an invisible orphan — the one place
    * concurrent publishes are arbitrated.
    */
  private[etl] def commitManifest(spark: SparkSession, root: String, v: Long,
                                  files: Seq[String], tag: Option[String],
                                  tsMillis: Option[Long] = None): Unit = {
    val (fs, _) = Refresh.hfs(spark, root)
    val mdir = new Path(root, ManifestsDir)
    fs.mkdirs(mdir)
    val tmp = new Path(mdir, s".tmp-v=$v-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    val lines = Seq(TsLine + tsMillis.getOrElse(System.currentTimeMillis())) ++
      tag.map(TagLine + _).toSeq ++ files
    try out.write(lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, manifestPath(root, v)) // Rename.NONE: fail if committed
    // tag→version index entry, AFTER the manifest is committed: one
    // no-overwrite rename per tag, so [[versionForTag]] is an O(1)
    // pointer read instead of a newest-K manifest scan. The pointer is
    // an OPTIMIZATION, never the source of truth — so the WHOLE block is
    // guarded, not just the rename: the manifest above has already
    // committed, and a pointer-side IOException escaping here would
    // abort publish() before its _LATEST flip while the replayed
    // batch's versionForTag probe finds the tag and skips — the batch's
    // committed version would silently never become latest. A failed
    // pointer write just means this tag resolves via the fallback scan.
    tag.foreach { t =>
      try {
        val ptmp = new Path(mdir, s".tmp-tag-${java.util.UUID.randomUUID()}")
        val pout = fs.create(ptmp, true)
        try pout.write(s"$v\n$t".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally pout.close()
        try fc.rename(ptmp, tagPointerPath(root, t)) // first committer wins
        catch { case scala.util.control.NonFatal(_) => fs.delete(ptmp, false); () }
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[versioned] tag pointer write failed for $t: $e")
      }
    }
  }

  /** Index entry for `tag` under `_manifests`: filename is the tag's MD5
    * (tags are free-form batch ids — not filename-safe), content is
    * `version\ntag` so a hash collision is detected by comparing the
    * stored tag, never silently resolved.
    */
  private[etl] def tagPointerPath(root: String, tag: String): Path = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new Path(s"$root/$ManifestsDir", s"tag-$h.ptr")
  }

  /** Publish `df` as the next version and flip `_LATEST` to it; returns
    * the new version number. Ordering: data write → manifest commit →
    * pointer flip. A crash before the manifest leaves an uncommitted
    * orphan no reader observes; a crash after it leaves a committed
    * version the pointer doesn't name yet — re-publishable state either
    * way, never a broken pointer. The next number skips BOTH committed
    * and merely-staged versions, so a crashed publish's directory is
    * superseded, never silently adopted.
    *
    * `tag` is an optional idempotency token recorded atomically INSIDE
    * the commit manifest: a retrying writer (a streaming batch replayed
    * after a crash) first asks [[versionForTag]] and skips the publish
    * when its tag already committed. Because tag and version commit in
    * ONE atomic rename, a crash at any point leaves either no version
    * (retry publishes) or a tagged version (retry skips) — never a
    * duplicate: exactly-once published versions on top of an
    * at-least-once batch executor.
    */
  def publish(df: DataFrame, root: String, tag: Option[String] = None): Long = {
    val spark = df.sparkSession
    val next = (listVersions(spark, root) ++ stagedVersions(spark, root))
      .maxOption.getOrElse(0L) + 1L
    val dir = versionDir(root, next)
    df.write.mode("errorifexists").parquet(dir)
    val (fs, _) = Refresh.hfs(spark, root)
    def partFiles(): Seq[String] = fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName).sorted
    var files = partFiles()
    if (files.isEmpty) {
      // a 0-partition empty df writes only _SUCCESS; committing a
      // file-less manifest would create a version readVersion can never
      // open. Append one schema-bearing empty part file instead, so an
      // empty publish is a committed, readable, zero-row version.
      spark.createDataFrame(
          spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row], 1),
          df.schema)
        .write.mode("append").parquet(dir)
      files = partFiles()
    }
    commitManifest(spark, root, next, files, tag)
    flipPointer(spark, root, next)
    next
  }

  /** Read an explicit committed version: one manifest open resolves the
    * exact file list — Spark scans those files and nothing else, so
    * debris in the data directory (dead speculative-task output, a
    * concurrent writer's staging) can never leak into results.
    */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val files = manifestFiles(spark, root, v).map(f => s"${versionDir(root, v)}/$f")
    spark.read.parquet(files: _*)
  }

  /** Read the version `_LATEST` points at (the only read path normal
    * consumers use). Cost: one pointer read + one manifest read — O(1)
    * regardless of version count or data-file count.
    */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no published version under $root"))
    readVersion(spark, root, v)
  }

  /** Commit time of version `v` in epoch millis: the `#ts=` line its
    * manifest recorded at commit ([[migrate]] backfills it from the
    * legacy data directory's mtime), or — for manifests written before
    * the line existed — the manifest file's own modification time,
    * which the atomic rename stamped at commit.
    */
  def commitTimeOf(spark: SparkSession, root: String, v: Long): Long =
    manifestLines(spark, root, v).find(_.startsWith(TsLine))
      .map(_.stripPrefix(TsLine).toLong)
      .getOrElse {
        val (fs, _) = Refresh.hfs(spark, root)
        fs.getFileStatus(manifestPath(root, v)).getModificationTime
      }

  /** The newest version committed at-or-before `tsMillis` — time travel
    * over the snapshot store. Scans versions DESCENDING and stops at the
    * first qualifying one: that is exactly the max qualifying version
    * (no monotone-commit-time assumption needed — newer versions that
    * haven't qualified are merely skipped on the way down), and the
    * typical as-of-recent query opens O(tail) manifests instead of all
    * of them — the [[versionForTag]] cost posture, not an O(#versions)
    * sweep per call. None when `tsMillis` predates the first commit.
    */
  def versionAsOf(spark: SparkSession, root: String, tsMillis: Long): Option[Long] =
    listVersions(spark, root).reverseIterator
      .find(v => commitTimeOf(spark, root, v) <= tsMillis)

  /** Read the snapshot as it stood at `tsMillis` ("SELECT ... AS OF"):
    * resolve with [[versionAsOf]], read that version's manifest-exact
    * file list.
    */
  def readAsOf(spark: SparkSession, root: String, tsMillis: Long): DataFrame = {
    val v = versionAsOf(spark, root, tsMillis).getOrElse(
      throw new IllegalStateException(
        s"no version committed at or before $tsMillis under $root"))
    readVersion(spark, root, v)
  }

  /** Row-level change feed between two committed versions (CDC over the
    * snapshot store): keyed full-outer join of the two snapshots, each
    * row classified `insert` (key only in `vNew`), `delete` (only in
    * `vOld`) or `update` (both, but any compared column differs —
    * detected via one md5 per compare column concatenated and re-hashed
    * — every column contributes a fixed-width digest, so no value can
    * shift a column boundary, and the null sentinel sits outside the
    * hex alphabet, so no string value collides with it). This is what
    * an incremental downstream consumer reads
    * instead of re-scanning the new snapshot: cost is one shuffle of
    * each snapshot's (key, hash) projection — O(|vOld| + |vNew|), with
    * column pruning keeping the scan at key + compared columns; the
    * emitted feed is O(changes).
    */
  def diff(spark: SparkSession, root: String, vOld: Long, vNew: Long,
           keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "diff needs at least one key column")
    def hashed(v: Long, side: String) = {
      val h =
        if (compareCols.isEmpty) lit("")
        else md5(concat(
          compareCols.map(c =>
            coalesce(md5(col(c).cast("string")), lit("-"))): _*))
      readVersion(spark, root, v)
        .select(keyCols.map(col) :+ h.as(s"__h_$side"): _*)
    }
    val o = hashed(vOld, "old")
    val n = hashed(vNew, "new")
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__h_old").isNull, lit("insert"))
          .when(col("__h_new").isNull, lit("delete"))
          .when(col("__h_old") =!= col("__h_new"), lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }

  /** Point `_LATEST` back at an older (still-committed) version —
    * instant, no data movement.
    */
  def rollback(spark: SparkSession, root: String, v: Long): Unit = {
    require(listVersions(spark, root).contains(v), s"cannot roll back to absent version $v")
    flipPointer(spark, root, v)
  }

  /** Delete committed versions older than `keep` trailing ones (never the
    * pointed-at version) plus any uncommitted orphan directory a crashed
    * or losing publish left behind; returns the reclaimed version
    * numbers. Manifest is deleted FIRST — the version stops existing for
    * readers before any data file goes, so a crash mid-vacuum leaves an
    * orphan, not a committed version with missing files. Explicit
    * retention: at 100 TB, stale snapshots are the storage bill, but
    * deleting one a reader still scans is an outage — the operator picks
    * the window. Orphan GC assumes the single-writer regime: don't run
    * vacuum while a publish is in flight.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least one version")
    val (fs, _) = Refresh.hfs(spark, root)
    val vs = listVersions(spark, root)
    val current = currentVersion(spark, root)
    val deletable = vs.dropRight(keep).filterNot(current.contains)
    deletable.foreach { v =>
      // capture the tag BEFORE the manifest goes, so the version's index
      // pointer is reclaimed with it (a stale pointer is harmless —
      // versionForTag verifies — but it would leak one tiny file per
      // vacuumed tagged version forever)
      val tag = tagOf(spark, root, v)
      fs.delete(manifestPath(root, v), false)
      fs.delete(new Path(versionDir(root, v)), true)
      tag.foreach(t => fs.delete(tagPointerPath(root, t), false))
    }
    // the pointed-at version is NEVER orphan-GC'd, even when it has no
    // manifest: a pre-manifest root (see [[migrate]]) has live data dirs
    // with no manifest entry, and treating the version _LATEST names as
    // deletable debris would be silent data loss on upgrade
    val orphans = stagedVersions(spark, root)
      .filterNot(listVersions(spark, root).contains)
      .filterNot(current.contains)
    orphans.foreach(v => fs.delete(new Path(versionDir(root, v)), true))
    (deletable ++ orphans).sorted
  }

  /** One-shot upgrade of a PRE-MANIFEST extract root (a root whose `v=N`
    * directories were published before the commit-manifest format): backfill
    * a manifest for every data directory that lacks one, from its directory
    * listing. Without this, manifest-era readers don't see legacy versions
    * at all and [[vacuum]]'s orphan GC would treat them as uncommitted
    * debris. Run once per legacy root BEFORE any vacuum; returns the
    * versions backfilled. Idempotent — already-committed versions are
    * skipped — and safe on a fresh manifest-era root (no-op). A directory
    * with zero part files (a genuinely crashed publish) is left
    * unmanifested for vacuum to reclaim.
    */
  def migrate(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, _) = Refresh.hfs(spark, root)
    val committed = listVersions(spark, root).toSet
    val legacy = stagedVersions(spark, root).filterNot(committed)
    legacy.flatMap { v =>
      val files = fs.listStatus(new Path(versionDir(root, v))).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .map(_.getPath.getName).sorted
      if (files.isEmpty) None
      else {
        // a legacy version's best commit-time estimate is its data
        // directory's mtime, not the migration's wall clock — time
        // travel across the migration boundary stays meaningful
        val dirTs = fs.getFileStatus(new Path(versionDir(root, v)))
          .getModificationTime
        commitManifest(spark, root, v, files, None, Some(dirTs))
        Some(v)
      }
    }
  }
}
