package graft.etl

import graft.SparkSpec

/** Snapshot-isolated extract publishing: version directories are
  * immutable, the pointer flip is the only mutation, rollback moves no
  * data, vacuum never deletes the pointed-at version.
  */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("versioned").toString + "/extract"

  test("publish → readLatest round-trips and versions are immutable") {
    val root = freshRoot()
    assert(Versioned.currentVersion(spark, root).isEmpty)
    assert(Versioned.publish(Seq(1, 2, 3).toDF("x"), root) == 1L)
    val v1Files = new java.io.File(s"$root/v=1").listFiles().map(_.getName).toSet
    assert(Versioned.publish(Seq(4, 5).toDF("x"), root) == 2L)
    assert(Versioned.currentVersion(spark, root).contains(2L))
    assert(Versioned.readLatest(spark, root).count() == 2L)
    // a reader that resolved v=1 before the flip scans untouched files
    assert(new java.io.File(s"$root/v=1").listFiles().map(_.getName).toSet == v1Files)
    assert(Versioned.readVersion(spark, root, 1L)
      .as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(Versioned.listVersions(spark, root) == Seq(1L, 2L))
  }

  test("rollback is a pointer flip; republish continues the version sequence") {
    val root = freshRoot()
    Versioned.publish(Seq("a").toDF("s"), root)
    Versioned.publish(Seq("b").toDF("s"), root)
    Versioned.rollback(spark, root, 1L)
    assert(Versioned.currentVersion(spark, root).contains(1L))
    assert(Versioned.readLatest(spark, root).as[String].head() == "a")
    // next publish supersedes both (max present + 1, not pointer + 1)
    assert(Versioned.publish(Seq("c").toDF("s"), root) == 3L)
    assert(Versioned.readLatest(spark, root).as[String].head() == "c")
    intercept[IllegalArgumentException] { Versioned.rollback(spark, root, 9L) }
  }

  test("a crash between data write and pointer flip never breaks readers") {
    val root = freshRoot()
    Versioned.publish(Seq(1, 2).toDF("x"), root)
    // simulate the crash: v=2's data lands completely but the process
    // dies before flipPointer — exactly what a mid-publish kill leaves
    Seq(7, 8, 9).toDF("x").write.parquet(s"$root/v=2")
    // latest readers are untouched by the dangling directory
    assert(Versioned.currentVersion(spark, root).contains(1L))
    assert(Versioned.readLatest(spark, root).count() == 2L)
    // recovery is a plain re-publish: the dangling v=2 is superseded
    // (next = max present + 1), never silently adopted
    assert(Versioned.publish(Seq(10).toDF("x"), root) == 3L)
    assert(Versioned.readLatest(spark, root).as[Int].head() == 10)
    // and vacuum can reclaim the orphan once enough versions trail it
    Versioned.publish(Seq(11).toDF("x"), root)
    assert(Versioned.vacuum(spark, root, keep = 2) == Seq(1L, 2L))
    assert(Versioned.listVersions(spark, root) == Seq(3L, 4L))
  }

  test("readers resolve through the manifest, never the data tree") {
    val root = freshRoot()
    Versioned.publish(Seq(1, 2, 3).toDF("x"), root)
    // poison the data tree: a debris parquet file inside v=1 that the
    // manifest does not name (dead speculative task / crashed writer),
    // plus a stray non-numeric v= directory (a tool's scratch)
    val debrisSrc = java.nio.file.Files.createTempDirectory("debris").toString
    Seq(100, 200).toDF("x").write.parquet(s"$debrisSrc/p")
    val part = new java.io.File(s"$debrisSrc/p").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$root/v=1/part-zzz-debris.parquet"))
    new java.io.File(s"$root/v=tmp").mkdirs()
    // a directory-listing reader would see 5 rows (or crash on v=tmp);
    // the manifest reader sees exactly what v=1 committed
    assert(Versioned.readVersion(spark, root, 1L)
      .as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(Versioned.readLatest(spark, root).count() == 3L)
    assert(Versioned.listVersions(spark, root) == Seq(1L))
    // an uncommitted staged directory is not a readable version
    Seq(9).toDF("x").write.parquet(s"$root/v=2")
    intercept[IllegalArgumentException] { Versioned.readVersion(spark, root, 2L) }
    assert(Versioned.listVersions(spark, root) == Seq(1L))
    // and the manifest records exactly the committed files
    val committed = Versioned.manifestFiles(spark, root, 1L)
    assert(committed.nonEmpty && committed.forall(_.endsWith(".parquet")))
    assert(!committed.contains("part-zzz-debris.parquet"))
  }

  test("vacuum keeps the trailing window and never the pointed-at version") {
    val root = freshRoot()
    (1 to 4).foreach(i => Versioned.publish(Seq(i).toDF("x"), root))
    Versioned.rollback(spark, root, 1L) // pointer at the OLDEST version
    val deleted = Versioned.vacuum(spark, root, keep = 2)
    // v=1 survives despite falling outside the window: it is pointed at
    assert(deleted == Seq(2L))
    assert(Versioned.listVersions(spark, root) == Seq(1L, 3L, 4L))
    assert(Versioned.readLatest(spark, root).as[Int].head() == 1)
  }

  test("an empty publish commits a readable zero-row version") {
    val root = freshRoot()
    // 0-partition empty df: parquet writes no part files at all — the
    // publish must still produce a version readVersion can open
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Seq(1).toDF("x").schema)
    val v = Versioned.publish(empty, root)
    val got = Versioned.readVersion(spark, root, v)
    assert(got.count() == 0L)
    assert(got.schema.fieldNames.toSeq == Seq("x"))
  }

  test("migrate backfills manifests for pre-manifest roots; vacuum spares them") {
    val root = freshRoot()
    Versioned.publish(Seq(1).toDF("x"), root)
    Versioned.publish(Seq(2).toDF("x"), root)
    // simulate a legacy (pre-manifest) root: drop the manifests but keep
    // data dirs + pointer, exactly what an old release left on disk
    val (fs, _) = Refresh.hfs(spark, root)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_manifests"), true)
    assert(Versioned.listVersions(spark, root).isEmpty)
    // safety net: even unmigrated, vacuum must not GC the pointed-at dir
    Versioned.vacuum(spark, root, keep = 1)
    assert(Versioned.currentVersion(spark, root).contains(2L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v=2")))
    val migrated = Versioned.migrate(spark, root)
    assert(migrated == Seq(2L)) // v=1 was orphan-GC'd above (unpointed, unmanifested)
    assert(Versioned.readLatest(spark, root).as[Int].head() == 2)
    // idempotent: second run is a no-op
    assert(Versioned.migrate(spark, root).isEmpty)
  }

  test("versionForTag: index answers full history; fallback honors lookback") {
    val root = freshRoot()
    Versioned.publish(Seq(1).toDF("x"), root, tag = Some("batch-1"))
    Versioned.publish(Seq(2).toDF("x"), root, tag = Some("batch-2"))
    Versioned.publish(Seq(3).toDF("x"), root, tag = Some("batch-3"))
    assert(Versioned.versionForTag(spark, root, "batch-2").contains(2L))
    // the tag index answers at ANY depth, regardless of lookback
    assert(Versioned.versionForTag(spark, root, "batch-1", lookback = 1).contains(1L))
    assert(Versioned.versionForTag(spark, root, "batch-3", lookback = 1).contains(3L))
    // pre-index root (tagged commits older than the index, or a crash
    // between manifest and pointer renames): delete the pointer — the
    // fallback manifest scan honors the lookback window
    val (fs, _) = graft.etl.Refresh.hfs(spark, root)
    fs.delete(Versioned.tagPointerPath(root, "batch-1"), false)
    assert(Versioned.versionForTag(spark, root, "batch-1", lookback = 1).isEmpty)
    assert(Versioned.versionForTag(spark, root, "batch-1").contains(1L))
  }

  test("tag index: versionForTag stays O(1) manifest reads at 1k versions") {
    val root = freshRoot()
    // manifest-only commits through the internal hook — the probe's cost
    // model doesn't care whether data files exist
    (1L to 1000L).foreach { v =>
      Versioned.commitManifest(spark, root, v, Seq("part-00000"),
        Some(s"t-$v"), tsMillis = Some(v))
    }
    // lookback=1 permits at most ONE manifest on the scan path, so only
    // the O(1) index can answer the OLDEST tag — this is the proof the
    // probe did not walk the 1k-manifest history
    assert(Versioned.versionForTag(spark, root, "t-1", lookback = 1).contains(1L))
    assert(Versioned.versionForTag(spark, root, "t-500", lookback = 1).contains(500L))
    assert(Versioned.versionForTag(spark, root, "t-1000", lookback = 1).contains(1000L))
    assert(Versioned.versionForTag(spark, root, "t-nope", lookback = 1).isEmpty)
    // a vacuumed tagged version reclaims its pointer and stops resolving
    Versioned.vacuum(spark, root, keep = 999)
    assert(Versioned.versionForTag(spark, root, "t-1", lookback = 1).isEmpty)
    assert(!fs(root).exists(Versioned.tagPointerPath(root, "t-1")))
  }

  private def fs(root: String) = graft.etl.Refresh.hfs(spark, root)._1

  test("diff classifies insert/delete/update; null-vs-empty and no-op rows behave") {
    val root = freshRoot()
    // key 1 unchanged, key 2 updated, key 3 deleted, key 4 inserted,
    // key 5 null -> "" (must register as an UPDATE, not a no-op: the
    // row hash sentinels nulls apart from empty strings), key 6 stays
    // null (no-op)
    Versioned.publish(Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (5L, Option.empty[String]), (6L, Option.empty[String]))
      .toDF("id", "t"), root)
    Versioned.publish(Seq(
      (1L, Option("a")), (2L, Option("B")), (4L, Option("d")),
      (5L, Option("")), (6L, Option.empty[String]))
      .toDF("id", "t"), root)
    val d = Versioned.diff(spark, root, 1L, 2L, Seq("id"), Seq("t"))
      .as[(Long, String)].collect().toMap
    assert(d == Map(2L -> "update", 3L -> "delete", 4L -> "insert",
      5L -> "update"), s"got $d")
    // with no compare columns the feed is membership-only
    val m = Versioned.diff(spark, root, 1L, 2L, Seq("id"), Nil)
      .as[(Long, String)].collect().toMap
    assert(m == Map(3L -> "delete", 4L -> "insert"), s"got $m")
  }

  test("time travel: readAsOf resolves the snapshot a timestamp saw") {
    val root = freshRoot()
    val before = System.currentTimeMillis() - 1
    Versioned.publish(Seq("v1").toDF("t"), root)
    val t1 = Versioned.commitTimeOf(spark, root, 1L)
    Thread.sleep(5) // distinct commit millis for the two versions
    Versioned.publish(Seq("v2a", "v2b").toDF("t"), root)
    val t2 = Versioned.commitTimeOf(spark, root, 2L)
    assert(t1 < t2, s"commit times must be monotone: $t1 vs $t2")
    // as-of each commit instant: exactly that snapshot
    assert(Versioned.versionAsOf(spark, root, t1).contains(1L))
    assert(Versioned.readAsOf(spark, root, t1).as[String].collect().toSeq
      == Seq("v1"))
    assert(Versioned.versionAsOf(spark, root, t2).contains(2L))
    assert(Versioned.readAsOf(spark, root, System.currentTimeMillis())
      .count() == 2L)
    // between the commits: still the older snapshot
    if (t2 - t1 > 1)
      assert(Versioned.versionAsOf(spark, root, t2 - 1).contains(1L))
    // before the first commit: nothing to read
    assert(Versioned.versionAsOf(spark, root, before).isEmpty)
    intercept[IllegalStateException] {
      Versioned.readAsOf(spark, root, before)
    }
  }

  test("migrate backfills legacy commit times from the data directory, not the clock") {
    val root = freshRoot()
    Versioned.publish(Seq("x").toDF("t"), root)
    // forge a legacy (pre-manifest) version: data dir without a manifest
    val legacyDir = s"$root/v=2"
    Seq("legacy").toDF("t").write.parquet(legacyDir)
    val dirTs = {
      val (fs, _) = graft.etl.Refresh.hfs(spark, root)
      fs.getFileStatus(new org.apache.hadoop.fs.Path(legacyDir))
        .getModificationTime
    }
    Thread.sleep(5)
    assert(Versioned.migrate(spark, root) == Seq(2L))
    assert(Versioned.commitTimeOf(spark, root, 2L) == dirTs,
      "migrated version must carry the data dir's mtime, not migration time")
  }
}
