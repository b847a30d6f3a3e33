package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.streaming.Streams._

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("step: success resets, threshold deactivates, post-deactivation ignored") {
    val s0 = FileState(0, active = true)
    assert(step(s0, Seq(SyncEvent(1, 1, success = false)))._1 == FileState(1, true))
    assert(step(FileState(2, true), Seq(SyncEvent(1, 1, success = true)))._1 == FileState(0, true))
    val (dead, crossed) = step(FileState(2, true), Seq(SyncEvent(1, 1, success = false)))
    assert(dead == FileState(3, false) && crossed)
    // events after deactivation change nothing
    assert(step(dead, Seq(SyncEvent(1, 2, success = true)))._1 == dead)
    // fold order follows seq, not input order
    val (s, _) = step(s0, Seq(SyncEvent(1, 2, success = false), SyncEvent(1, 1, success = true)))
    assert(s == FileState(1, true))
  }

  test("trackFailures maintains state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SyncEvent]
    val q = trackFailures(input.toDS())
      .writeStream.format("memory").queryName("updates")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_track"))
      .start()
    try {
      input.addData(SyncEvent(1, 1, success = false), SyncEvent(1, 2, success = false),
        SyncEvent(2, 1, success = true))
      q.processAllAvailable()
      input.addData(SyncEvent(1, 3, success = false)) // crosses threshold
      q.processAllAvailable()
      val out = spark.table("updates").as[FileUpdate].collect()
        .groupBy(_.fileId).view.mapValues(_.last).toMap
      assert(out(1L) == FileUpdate(1L, 3, "file_unavailable", deactivated = true))
      assert(out(2L) == FileUpdate(2L, 0, "file_available", deactivated = false))
    } finally q.stop()
  }

  test("batch formulation agrees with streaming fold") {
    val events = Seq(
      SyncEvent(1, 1, success = false), SyncEvent(1, 2, success = false),
      SyncEvent(1, 3, success = false), SyncEvent(1, 4, success = true),
      SyncEvent(2, 1, success = false), SyncEvent(2, 2, success = true),
      SyncEvent(2, 3, success = false)).toDS()
    val out = trackFailuresBatch(events).collect().map(u => u.fileId -> u).toMap
    assert(out(1L).status == "file_unavailable") // dead at seq 3, seq 4 ignored
    assert(out(2L) == FileUpdate(2L, 1, "latest_sync_failed", deactivated = false))
  }

  test("refreshQuery drains a CSV landing dir into the parquet extract") {
    val src = tmp("landing")
    val extract = tmp("extract") + "/data"
    Files.writeString(java.nio.file.Path.of(src, "batch1.csv"),
      "id,name\n1,a\n2,b\n")
    val q = refreshQuery(spark, src, "id LONG, name STRING", extract,
      tmp("ckpt_refresh"))
    q.awaitTermination()
    val got = spark.read.parquet(extract).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }

  test("versionedRefreshQuery publishes each sync as an immutable version with rollback") {
    import graft.etl.Versioned
    val src = tmp("landing_versioned")
    val root = tmp("versioned_stream") + "/extract"
    Files.writeString(java.nio.file.Path.of(src, "export_1.csv"),
      "id,name\n1,a\n2,b\n")
    versionedRefreshQuery(spark, src, "id LONG, name STRING", root,
      tmp("ckpt_versioned")).awaitTermination()
    assert(Versioned.currentVersion(spark, root).contains(1L))
    val v1Files = new java.io.File(s"$root/v=1").listFiles().map(_.getName).toSet

    // second sync: a new version, pointer flips, v=1's files untouched
    Files.writeString(java.nio.file.Path.of(src, "export_2.csv"),
      "id,name\n1,a2\n3,c\n")
    versionedRefreshQuery(spark, src, "id LONG, name STRING", root,
      tmp("ckpt_versioned")).awaitTermination()
    assert(Versioned.currentVersion(spark, root).contains(2L))
    assert(Versioned.readLatest(spark, root).count() == 2L)
    assert(new java.io.File(s"$root/v=1").listFiles().map(_.getName).toSet == v1Files)

    // a bad sync is one rollback away — no data movement, no re-sync
    Versioned.rollback(spark, root, 1L)
    assert(Versioned.readLatest(spark, root)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))

    // retention: keep=1 trims history but never the pointed-at version
    Files.writeString(java.nio.file.Path.of(src, "export_3.csv"),
      "id,name\n9,z\n")
    versionedRefreshQuery(spark, src, "id LONG, name STRING", root,
      tmp("ckpt_versioned"), keep = 1).awaitTermination()
    assert(Versioned.currentVersion(spark, root).contains(3L))
    assert(Versioned.listVersions(spark, root) == Seq(3L))
  }

  test("versionedRefreshQuery crash recovery: restart is exactly-once, _LATEST intact") {
    import graft.etl.Versioned
    val src = tmp("landing_crash")
    val root = tmp("versioned_crash") + "/extract"
    val ckpt = tmp("ckpt_crash")
    val ddl = "id LONG, name STRING"
    // restarts REUSE this checkpoint (that is the point of the test); a
    // just-terminated run can still be releasing its metadata logs when
    // the next one starts, so drain the manager between runs
    def drainStreams(): Unit = {
      val deadline = System.nanoTime() + 30_000_000_000L
      while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      spark.streams.resetTerminated()
    }
    Files.writeString(java.nio.file.Path.of(src, "export_1.csv"), "id,name\n1,a\n2,b\n")
    versionedRefreshQuery(spark, src, ddl, root, ckpt).awaitTermination()
    drainStreams()
    assert(Versioned.currentVersion(spark, root).contains(1L))

    // crash MID-BATCH on sync 2 (prepare throws before the publish): the
    // checkpoint never commits the batch; readers keep an intact v1
    Files.writeString(java.nio.file.Path.of(src, "export_2.csv"), "id,name\n3,c\n")
    val boom = versionedRefreshQuery(spark, src, ddl, root, ckpt,
      prepare = _ => throw new RuntimeException("injected crash"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      boom.awaitTermination()
    }
    boom.stop()
    drainStreams()
    assert(Versioned.currentVersion(spark, root).contains(1L))
    assert(Versioned.listVersions(spark, root) == Seq(1L))

    // restart from the SAME checkpoint: the failed batch replays and the
    // drained sync lands EXACTLY once
    versionedRefreshQuery(spark, src, ddl, root, ckpt).awaitTermination()
    drainStreams()
    assert(Versioned.listVersions(spark, root) == Seq(1L, 2L))
    assert(Versioned.currentVersion(spark, root).contains(2L))
    assert(Versioned.readLatest(spark, root).as[(Long, String)].collect().toSeq
      == Seq((3L, "c")))

    // the HARD crash window — version published, checkpoint commit lost
    // (kill between side effect and commit): simulate it for real by
    // deleting the last commit marker, forcing Spark to replay the batch
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    // local ChecksumFileSystem keeps a .N.crc shadow per commit marker;
    // a real crash loses both, so the simulation must delete both (a
    // stale shadow makes the replayed commit's rename collide)
    new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc").delete()
    assert(commits.last.delete())
    versionedRefreshQuery(spark, src, ddl, root, ckpt).awaitTermination()
    drainStreams()
    // the replayed batch found its idempotency tag in v2's manifest and
    // skipped: no duplicate version, pointer still on the same complete v2
    assert(Versioned.listVersions(spark, root) == Seq(1L, 2L))
    assert(Versioned.currentVersion(spark, root).contains(2L))
    assert(Versioned.tagOf(spark, root, 2L).exists(_.endsWith(":1")))
  }

  test("T4: a resident refresh query is cancellable; the extract survives") {
    val src = tmp("landing_cancel")
    val extract = tmp("extract_cancel") + "/data"
    Files.writeString(java.nio.file.Path.of(src, "b1.csv"), "id,name\n1,a\n")
    val q = refreshQuery(spark, src, "id LONG, name STRING", extract,
      tmp("ckpt_cancel"), trigger = Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(extract).count() == 1L)
    } finally q.stop() // the reference's scheduler job-cancel analog
    assert(!q.isActive)
    // work landing after cancellation is not picked up ...
    Files.writeString(java.nio.file.Path.of(src, "b2.csv"), "id,name\n2,b\n")
    Thread.sleep(1500)
    assert(spark.read.parquet(extract).count() == 1L)
    // ... and cancel drops only the job, never the data product
  }

  test("T5: bootstrap re-registers one refresh query per active catalog file") {
    import graft.catalog._
    val root = tmp("metastore_boot")
    val store = new MetaStore(spark, root)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    store.initHyperFiles(Seq(
      HyperFileMeta(1L, 10L, 100L, "a.parquet", FileStatus.FileAvailable,
        isActive = true, Map.empty, t0),
      HyperFileMeta(2L, 10L, 200L, "b.parquet", FileStatus.LatestSyncFailed,
        isActive = true, Map.empty, t0),
      HyperFileMeta(3L, 10L, 300L, "dead.parquet", FileStatus.FileUnavailable,
        isActive = false, Map.empty, t0)))
    // the startup re-schedule: activeFiles is the schedulable set; each
    // gets its own refresh query (the reference re-creates cron jobs from
    // the DB on boot, app/utils/onadata_utils.py:295-303)
    val jobs = store.activeFiles().collect().toSeq.map { f =>
      val src = tmp(s"landing_boot_${f.id}")
      Files.writeString(java.nio.file.Path.of(src, "b.csv"), s"id,name\n${f.id},x\n")
      val extract = tmp(s"extract_boot_${f.id}") + "/data"
      val q = refreshQuery(spark, src, "id LONG, name STRING", extract,
        tmp(s"ckpt_boot_${f.id}"))
      (f.id, extract, q)
    }
    assert(jobs.map(_._1).toSet == Set(1L, 2L), "inactive file must get no job")
    jobs.foreach(_._3.awaitTermination()) // AvailableNow: drain then stop
    jobs.foreach { case (id, extract, _) =>
      val got = spark.read.parquet(extract).as[(Long, String)].collect().toSeq
      assert(got == Seq((id, "x")))
    }
  }

  test("catch-up drain: latest export wins, snapshots are not concatenated") {
    val src = tmp("landing_catchup")
    // two COMPLETE exports land before one AvailableNow drain
    Files.writeString(java.nio.file.Path.of(src, "export_2024-01-01.csv"),
      "id,name\n1,a\n2,b\n")
    Files.writeString(java.nio.file.Path.of(src, "export_2024-01-02.csv"),
      "id,name\n1,a2\n3,c\n")
    val extract = tmp("extract_catchup") + "/data"
    val q = refreshQuery(spark, src, "id LONG, name STRING", extract, tmp("ckpt_catchup"))
    q.awaitTermination()
    val got = spark.read.parquet(extract).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (3L, "c")), s"expected only the latest snapshot, got $got")
  }

  test("catch-up drain orders by modification time, not filename") {
    val src = tmp("landing_mtime")
    // the OLDER snapshot has the lexicographically GREATER name — filename
    // ordering would refresh from the stale export
    val stale = java.nio.file.Path.of(src, "zz_legacy_export.csv")
    Files.writeString(stale, "id,name\n1,old\n9,stale\n")
    val fresh = java.nio.file.Path.of(src, "aa_export.csv")
    Files.writeString(fresh, "id,name\n1,new\n3,c\n")
    // pin mtimes so the ordering is deterministic regardless of write speed
    stale.toFile.setLastModified(1700000000000L)
    fresh.toFile.setLastModified(1700000060000L)
    val extract = tmp("extract_mtime") + "/data"
    val q = refreshQuery(spark, src, "id LONG, name STRING", extract, tmp("ckpt_mtime"))
    q.awaitTermination()
    val got = spark.read.parquet(extract).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "new"), (3L, "c")), s"expected the newest snapshot, got $got")
  }

  test("incrementalRefreshQuery MERGEs each drained batch into the extract") {
    val src = tmp("landing_incr")
    val extract = tmp("extract_incr") + "/data"
    val ckpt = tmp("ckpt_incr")
    Files.writeString(java.nio.file.Path.of(src, "delta1.csv"),
      "id,name\n1,a\n2,b\n")
    incrementalRefreshQuery(spark, src, "id LONG, name STRING", extract,
      ckpt, Seq("id")).awaitTermination()
    // a later delta updates key 2 and adds 3 — MERGE, not replace
    Files.writeString(java.nio.file.Path.of(src, "delta2.csv"),
      "id,name\n2,b2\n3,c\n")
    incrementalRefreshQuery(spark, src, "id LONG, name STRING", extract,
      ckpt, Seq("id")).awaitTermination()
    val got = spark.read.parquet(extract).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c")), s"got $got")
  }

  test("enrichStream joins a stream against a static dimension per batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Double)]
    val q = enrichStream(input.toDF().toDF("user_id", "v"), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_enrich"))
      .start()
    try {
      input.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      val got = spark.table("enriched").select($"user_id", $"tier")
        .as[(Long, Option[String])].collect().toSet
      // matched rows enrich; unmatched keys survive with null (left join)
      assert(got == Set((1L, Some("gold")), (3L, None)), s"got $got")
    } finally q.stop()
  }

  test("joinStreams pairs events across two streams within the window, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val impressions = MemoryStream[(java.sql.Timestamp, Long, String)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)]
    val joined = joinStreams(
      impressions.toDF().toDF("ts", "ad_id", "imp"),
      "ts",
      clicks.toDF().toDF("ts", "ad_id", "click"),
      "ts", Seq("ad_id"), joinWindow = "1 hour")
    val q = joined.select($"ad_id", $"imp", $"r_click")
      .writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_ssjoin"))
      .start()
    try {
      impressions.addData((ts("2024-01-01 10:00:00"), 7L, "i1"))
      q.processAllAvailable()
      // click 20 min later, same ad -> inside the window; a click 3 h
      // later and a different ad never pair
      clicks.addData((ts("2024-01-01 10:20:00"), 7L, "c1"),
        (ts("2024-01-01 13:00:00"), 7L, "late"),
        (ts("2024-01-01 10:05:00"), 9L, "other"))
      q.processAllAvailable()
      val got = spark.table("attributed")
        .as[(Long, String, String)].collect().toSet
      assert(got == Set((7L, "i1", "c1")), s"got $got")
    } finally q.stop()
  }

  test("sessionCounts merges events within the gap and emits closed sessions once") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = sessionCounts(input.toDF().toDF("ts", "user"), "ts", "user",
        gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_sess"))
      .start()
    try {
      // two u1 events 10 min apart -> ONE session [10:00, 10:40)
      input.addData((ts("2024-01-01 10:00:00"), "u1"), (ts("2024-01-01 10:10:00"), "u1"))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0L, "open session must not emit")
      // a later event pushes the watermark past the session end -> emitted
      input.addData((ts("2024-01-01 13:00:00"), "u2"))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select($"user", $"n", $"session_start", $"session_end")
        .as[(String, Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSeq
      assert(got == Seq(("u1", 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"))),
        s"got $got")
    } finally q.stop()
  }

  test("dedupStream drops duplicate keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "event_id", "payload")
    val q = dedupStream(df, "ts", Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_dedup"))
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((ts("2024-01-01 10:00:00"), 1L, "a"),
        (ts("2024-01-01 10:00:01"), 1L, "dup-in-batch"),
        (ts("2024-01-01 10:00:02"), 2L, "b"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:05:00"), 1L, "dup-across-batch"),
        (ts("2024-01-01 10:06:00"), 3L, "c"))
      q.processAllAvailable()
      val got = spark.table("deduped").select("event_id", "payload")
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("nearDupSuppressStream drops near-identical docs across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val q = nearDupSuppressStream(df, "ts", "text", "1 hour")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_neardup"))
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val doc = "the quick brown fox jumps over the lazy dog again and again"
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, doc),
        (ts("2024-01-01 10:00:01"), 2L, doc),               // exact dup
        (ts("2024-01-01 10:00:02"), 3L, "a wholly different document text"),
        // < 3 words: no signature — must PASS THROUGH (exact-key tier),
        // not vanish
        (ts("2024-01-01 10:00:03"), 4L, "hi"))
      q.processAllAvailable()
      input.addData(
        (ts("2024-01-01 10:05:00"), 5L, doc),  // dup across batch
        (ts("2024-01-01 10:05:01"), 6L, "hi"), // exact short dup: suppressed
        (ts("2024-01-01 10:05:02"), 7L, "yo"), // distinct short: survives
        // NULL text: no content to dedup on — BOTH must survive, not
        // collapse to one via a shared null key
        (ts("2024-01-01 10:05:03"), 8L, null),
        (ts("2024-01-01 10:05:04"), 9L, null))
      q.processAllAvailable()
      val got = spark.table("neardup_stream").select("doc_id")
        .as[Long].collect().toSet
      assert(got == Set(1L, 3L, 4L, 7L, 8L, 9L))
    } finally q.stop()
  }

  test("syncTick records success and failure outcomes in the catalog") {
    import graft.catalog._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val store = new MetaStore(spark, tmp("metastore_sync"))
    store.initHyperFiles(Seq(
      HyperFileMeta(1L, 10L, 100L, "a.parquet", FileStatus.Queued,
        isActive = true, Map(MetaKeys.SyncFailures -> "0"), t0)))

    // success path: extract written, counter zeroed, file_available
    val src = tmp("landing_sync")
    Files.writeString(java.nio.file.Path.of(src, "b.csv"), "id,name\n1,a\n")
    val extract = tmp("extract_sync") + "/data"
    val q = syncTick(spark, src, "id LONG, name STRING", extract,
      tmp("ckpt_sync_ok"), store, fileId = 1L, at = t0)
    q.awaitTermination()
    assert(spark.read.parquet(extract).count() == 1L)
    var f = store.readHyperFiles().collect().head
    assert(f.fileStatus == FileStatus.FileAvailable)
    assert(f.metaData(MetaKeys.SyncFailures) == "0")

    // failure path: a throwing prepare records the failure instead of
    // killing the stream — counter bumps, status latest_sync_failed
    Files.writeString(java.nio.file.Path.of(src, "b2.csv"), "id,name\n2,b\n")
    val q2 = syncTick(spark, src, "id LONG, name STRING", extract,
      tmp("ckpt_sync_fail"), store, fileId = 1L, at = t0,
      prepare = _ => throw new RuntimeException("export corrupt"))
    q2.awaitTermination()
    f = store.readHyperFiles().collect().head
    assert(f.fileStatus == FileStatus.LatestSyncFailed)
    assert(f.metaData(MetaKeys.SyncFailures) == "1")
    assert(f.metaData(MetaKeys.FailureReason) == "export corrupt")
    // the last good extract survives the failed tick
    assert(spark.read.parquet(extract).count() == 1L)
  }

  test("syncTick postCommit publishes AFTER the commit; a failing publish is a sync failure") {
    import graft.catalog._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val store = new MetaStore(spark, tmp("metastore_pub"))
    store.initHyperFiles(Seq(
      HyperFileMeta(1L, 10L, 100L, "a.parquet", FileStatus.Queued,
        isActive = true, Map(MetaKeys.SyncFailures -> "0"), t0)))
    val src = tmp("landing_pub")
    Files.writeString(java.nio.file.Path.of(src, "e1.csv"), "id,name\n1,a\n")
    val extract = tmp("extract_pub") + "/data"

    // publish slot: a scripted graft.etl.Publish transport — the hook
    // composes the REAL publish combinator, observing the COMMITTED rows
    var publishedRows = -1L
    val session = new graft.etl.Publish.Session {
      def projects: Iterator[(String, String)] = Iterator("p1" -> "Analytics")
      def publish(projectId: String, path: String, overwrite: Boolean): String = {
        publishedRows = spark.read.parquet(path).count(); "ds-1"
      }
      def signOut(): Unit = ()
    }
    val dest = graft.etl.Publish.Destination("https://t", "s", "pat", "v", "Analytics")
    val q = syncTick(spark, src, "id LONG, name STRING", extract,
      tmp("ckpt_pub_ok"), store, fileId = 1L, at = t0,
      postCommit = p => graft.etl.Publish.publishExtract(_ => session, dest, p))
    q.awaitTermination()
    assert(publishedRows == 1L, "publish must see the committed extract")
    assert(store.readHyperFiles().collect().head.fileStatus == FileStatus.FileAvailable)

    // a refused upload records a FAILED round (counter bump) even though
    // the extract itself committed — the retry loop re-publishes
    Files.writeString(java.nio.file.Path.of(src, "e2.csv"), "id,name\n2,b\n")
    val q2 = syncTick(spark, src, "id LONG, name STRING", extract,
      tmp("ckpt_pub_fail"), store, fileId = 1L, at = t0,
      postCommit = _ => sys.error("upload refused"))
    q2.awaitTermination()
    val f = store.readHyperFiles().collect().head
    assert(f.fileStatus == FileStatus.LatestSyncFailed)
    assert(f.metaData(MetaKeys.SyncFailures) == "1")
    assert(f.metaData(MetaKeys.FailureReason) == "upload refused")

    // the batch's offsets are checkpointed, so re-running syncTick would
    // see nothing — retryPublish retries the fan-out ALONE against the
    // committed extract and restores file_available
    var retried = -1L
    val ok = retryPublish(store, 1L, extract,
      p => { retried = spark.read.parquet(p).count() }, t0)
    assert(ok)
    assert(retried == 1L) // the committed extract, republished
    val f2 = store.readHyperFiles().collect().head
    assert(f2.fileStatus == FileStatus.FileAvailable)
    assert(f2.metaData(MetaKeys.SyncFailures) == "0")
    // healthy file: retry is a no-op
    assert(!retryPublish(store, 1L, extract, _ => sys.error("boom"), t0))
  }

  test("syncTick: a hung transport exhausts the tick budget and records a failed round") {
    // the reference kills a sync job at TASK_TIMEOUT (app/jobs/
    // scheduler.py:11,86) and the round counts as failed; here a
    // transport that NEVER returns must not stall the streaming loop —
    // the watchdog records exactly one failure and the batch advances
    import graft.catalog._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val store = new MetaStore(spark, tmp("metastore_budget"))
    store.initHyperFiles(Seq(
      HyperFileMeta(1L, 10L, 100L, "a.parquet", FileStatus.Queued,
        isActive = true, Map(MetaKeys.SyncFailures -> "0"), t0)))
    val src = tmp("landing_budget")
    Files.writeString(java.nio.file.Path.of(src, "h.csv"), "id,name\n1,a\n")
    val extract = tmp("extract_budget") + "/data"
    val hungForever = new java.util.concurrent.CountDownLatch(1)
    val q = syncTick(spark, src, "id LONG, name STRING", extract,
      tmp("ckpt_budget"), store, fileId = 1L, at = t0,
      postCommit = _ => hungForever.await(), // hung upload: no response, ever
      tickBudgetMs = 1500L)
    try {
      // the loop must ADVANCE despite the hang: bounded wait, not forever
      assert(q.awaitTermination(60000L), "tick did not finish within 60 s")
      val f = store.readHyperFiles().collect().head
      assert(f.fileStatus == FileStatus.LatestSyncFailed)
      // exactly ONE failure for one timed-out round (the cancelled
      // worker must not double-record through its own catch path)
      assert(f.metaData(MetaKeys.SyncFailures) == "1")
      assert(f.metaData(MetaKeys.FailureReason).contains("budget"))
      // the extract itself committed before the hang — it survives
      assert(spark.read.parquet(extract).count() == 1L)
    } finally hungForever.countDown()
  }

  test("syncTick: a timeout DURING the extract write leaves the previous extract intact") {
    // the watchdog may cancel the tick while the refresh itself is the
    // hung stage (the most plausible multi-hour stage at scale). The
    // write goes through the staged swap, so the cancelled tick's
    // partial output is staging debris and the COMMITTED extract
    // survives — a plain mode("overwrite") would have cleared it first
    // and silently lost the data until the next successful tick
    import graft.catalog._
    import org.apache.spark.sql.DataFrame
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val store = new MetaStore(spark, tmp("metastore_writehang"))
    store.initHyperFiles(Seq(
      HyperFileMeta(1L, 10L, 100L, "a.parquet", FileStatus.Queued,
        isActive = true, Map(MetaKeys.SyncFailures -> "0"), t0)))
    val src = tmp("landing_writehang")
    Files.writeString(java.nio.file.Path.of(src, "e1.csv"), "id,name\n1,a\n")
    val extract = tmp("extract_writehang") + "/data"
    // tick 1: healthy — commits the extract
    val q1 = syncTick(spark, src, "id LONG, name STRING", extract,
      tmp("ckpt_wh1"), store, fileId = 1L, at = t0)
    q1.awaitTermination()
    assert(spark.read.parquet(extract).count() == 1L)
    // tick 2: the write job itself hangs (a task that never returns)
    // and the watchdog cancels it at the budget
    Files.writeString(java.nio.file.Path.of(src, "e2.csv"), "id,name\n2,b\n")
    val hangingWrite: DataFrame => DataFrame = df => {
      import df.sparkSession.implicits._
      df.select("id", "name").as[(Long, String)]
        .mapPartitions { it => Thread.sleep(600000L); it }
        .toDF("id", "name")
    }
    val q2 = syncTick(spark, src, "id LONG, name STRING", extract,
      tmp("ckpt_wh2"), store, fileId = 1L, at = t0,
      prepare = hangingWrite, tickBudgetMs = 1500L)
    assert(q2.awaitTermination(60000L), "tick did not finish within 60 s")
    val f = store.readHyperFiles().collect().head
    assert(f.fileStatus == FileStatus.LatestSyncFailed)
    assert(f.metaData(MetaKeys.SyncFailures) == "1")
    // the PREVIOUS extract survives the cancelled mid-write tick
    assert(spark.read.parquet(extract).as[(Long, String)].collect().toSet
      == Set((1L, "a")))
  }

  test("shardManifestStream: streamed fold == batch manifest (open-shard amend), replays no-op") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.ops.{Pack, TextAnalysis}
    val path = tmp("shard_manifest_stream") + "/manifest"
    val input = MemoryStream[(Long, String)]
    val q = shardManifestStream(spark, input.toDF().toDF("doc_id", "text"),
      path, tmp("ckpt_manifest"), shardTokens = 4L,
      trigger = Trigger.ProcessingTime(0))
    // batch 1 ends mid-shard-0; batch 2 OPENS shard 1; batch 3 must
    // AMEND still-open shard 1 (the modular-checksum add) and open 2
    input.addData((1L, "a b c"), (2L, "d e"))
    q.processAllAvailable()
    input.addData((3L, "f"))
    q.processAllAvailable()
    input.addData((4L, "g h"), (5L, "i j k l"))
    q.processAllAvailable()
    q.stop()
    val cols6 = Seq("shard_id", "n_docs", "n_tokens", "first_doc_id",
      "last_doc_id", "checksum")
    val streamed = spark.read.parquet(path).orderBy("shard_id")
      .select(cols6.head, cols6.tail: _*)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val whole = Seq((1L, "a b c"), (2L, "d e"), (3L, "f"), (4L, "g h"),
        (5L, "i j k l")).toDF("doc_id", "text")
    val batchM = Pack.shardManifest(whole, "doc_id", "text",
      TextAnalysis.tokenCount(col("text")), shardTokens = 4L)
    val expected = batchM.orderBy("shard_id").as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    batchM.unpersist()
    assert(streamed == expected && streamed.map(_._1) == Seq(0L, 1L, 2L))
    // shard 1 really is multi-batch: docs 3 (batch 2) and 4 (batch 3)
    assert(streamed(1)._2 == 2L && streamed(1)._4 == 3L && streamed(1)._5 == 4L)
    // a crash-replayed batch (ids at/below the high-water mark) no-ops
    Pack.shardManifestUpsert(spark,
      Seq((4L, "g h"), (5L, "i j k l")).toDF("doc_id", "text"), path,
      "doc_id", "text", TextAnalysis.tokenCount(col("text")), 4L)
    val after = spark.read.parquet(path).orderBy("shard_id")
      .select(cols6.head, cols6.tail: _*)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(after == streamed, "replay must not double-count")
    // the persisted manifest records its granularity, and a drifted
    // restart refuses loudly instead of merging unrelated boundaries
    intercept[IllegalArgumentException] {
      Pack.shardManifestUpsert(spark,
        Seq((6L, "m n o")).toDF("doc_id", "text"), path,
        "doc_id", "text", TextAnalysis.tokenCount(col("text")), 8L)
    }
  }

  test("annIndexStream upserts into the IVF index: insert, re-embed cell move, emptied cell dropped") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp("ann_index_stream") + "/idx"
    // two fixed unit centroids on the x / y axes — assignment is obvious
    val centroids = Array(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    val input = MemoryStream[(Long, Array[Float])]
    // resident trigger: AvailableNow would drain the (empty) stream and
    // stop before the batches below arrive
    val q = annIndexStream(spark, input.toDF().toDF("vec_id", "embedding"),
      path, centroids, tmp("ckpt_ann_idx"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // batch 1: v1,v2 near x (cell 0); v3 near y (cell 1)
    input.addData((1L, Array(0.9f, 0.1f)), (2L, Array(0.8f, 0.2f)),
      (3L, Array(0.1f, 0.9f)))
    q.processAllAvailable()
    val after1 = spark.read.parquet(path)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(after1 == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    // batch 2: v3 is RE-EMBEDDED near x (moves cell 1 -> 0, leaving cell
    // 1 empty — its stale dir must be dropped); v4 inserts into cell 0
    input.addData((3L, Array(0.95f, 0.05f)), (4L, Array(0.7f, 0.3f)))
    q.processAllAvailable()
    q.stop()
    val after2 = spark.read.parquet(path)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(after2 == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    // exactly one row per id (the update replaced, not duplicated), and
    // the emptied cell's partition directory is gone from storage
    assert(spark.read.parquet(path).count() == 4)
    assert(!new java.io.File(path.stripPrefix("file:") + "/cell=1").exists())
    // the index stays probe-able with source-level pruning
    val probed = graft.ops.Similarity.probeIvfIndex(spark, path, centroids,
      "vec_id", "embedding", Array(1.0, 0.0), k = 2, nProbe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(probed.subsetOf(Set(1L, 2L, 3L, 4L)) && probed.size == 2)
  }

  test("pqIndexStream encodes micro-batches with the committed quantizer and upserts touched cells") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val path = tmp("pq_index_stream") + "/idx"
    // seed index: 4 vectors near the two axes, 2 cells, 2x1-d codebooks
    val base = Seq(
      (1L, Seq(0.9, 0.1)), (2L, Seq(0.8, 0.2)),
      (3L, Seq(0.1, 0.9)), (4L, Seq(0.2, 0.8)))
      .toDF("vec_id", "embedding")
    val cb = graft.ops.Similarity.writePqIndex(base, "vec_id", "embedding",
      path, pqM = 2, pqKs = 2, ivfCells = 2, kmeansIters = 2)
    val input = MemoryStream[(Long, Array[Double])]
    val q = Streams.pqIndexStream(spark,
      input.toDF().toDF("vec_id", "embedding"), path, tmp("ckpt_pq_idx"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // batch 1: insert near-x v5; batch 2: re-embed v3 from y to x
    input.addData((5L, Array(0.95, 0.05)))
    q.processAllAvailable()
    input.addData((3L, Array(0.85, 0.15)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(path)
      .select(col("vec_id"), col("cell").cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L), rows.toString)
    assert(rows(5L) == rows(1L), "insert landed in the wrong cell")
    assert(rows(3L) == rows(1L), "re-embedded key did not move cells")
    // the sidecar (quantizer) is untouched by streaming merges, and the
    // index stays probe-able: the whole lifecycle's codes come from the
    // SEED-trained codebooks
    val (_, _, _, cb2, _) = graft.ops.Similarity.readPqSidecar(spark, path)
    assert(cb2.flatten.flatten.toSeq == cb.flatten.flatten.toSeq)
    val probed = graft.ops.Similarity.probePqIndex(spark, path, "vec_id",
        Array(1.0, 0.0), k = 2, nProbe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(probed.size == 2 && probed.subsetOf(Set(1L, 2L, 3L, 5L)),
      probed.toString)
  }

  test("zLayoutStream maintains the Z-clustered layout: insert, re-score cell move, box stays exact") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp("z_layout_stream") + "/layout"
    val bits = 10
    val k = 3 // 8x8 grid, cell width 128
    val input = MemoryStream[(Long, Long, Long)]
    val q = zLayoutStream(spark, input.toDF().toDF("id", "x", "y"),
      path, "id", "x", "y", bits, k, tmp("ckpt_zlayout"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // batch 1: two keys in cell (0,0)=0, one in cell (5,0)=17
    input.addData((1L, 10L, 10L), (2L, 100L, 40L), (3L, 650L, 110L))
    q.processAllAvailable()
    assert(spark.read.parquet(path).count() == 3)
    // batch 2: key 3 RE-SCORED into the box cell (its old cell 17 empties
    // and must vanish from storage); key 4 inserts into a DIFFERENT cell
    input.addData((3L, 120L, 30L), (4L, 660L, 300L))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(path).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 10L), (2L, 100L, 40L), (3L, 120L, 30L),
      (4L, 660L, 300L)))
    assert(!new java.io.File(path.stripPrefix("file:") + "/zbucket=17").exists(),
      "emptied cell's partition directory survived")
    // a box query over the maintained layout prunes AND answers exactly
    val box = graft.ops.Layout.boxQuery(spark, path, "x", "y",
      0, 127, 0, 127, bits, k)
    assert(box.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("nearDupPairsStream emits (first, dup) lineage across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val q = nearDupPairsStream(df, "ts", "doc_id", "text", "1 hour")
      .writeStream.format("memory").queryName("dup_pairs")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_duppairs"))
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val doc = "the quick brown fox jumps over the lazy dog again and again"
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, doc),
        (ts("2024-01-01 10:00:01"), 2L, doc),               // dup in batch
        (ts("2024-01-01 10:00:02"), 3L, "a wholly different document text"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:05:00"), 4L, doc))   // dup across batch
      q.processAllAvailable()
      val got = spark.table("dup_pairs").as[DupMatch].collect().toSet
      assert(got == Set(DupMatch(1L, 2L), DupMatch(1L, 4L)))
    } finally q.stop()
  }

  test("windowedCounts emits finalized windows under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "k")
    val q = Streams.windowedCounts(df, "ts", "k", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wins")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_win"))
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:20:00"), "a"))
      q.processAllAvailable()
      // advance the watermark far past the 10:00 window to finalize it
      input.addData((ts("2024-01-01 13:00:00"), "b"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:00:00"), "b"))
      q.processAllAvailable()
      val rows = spark.table("wins")
        .select($"win_start".cast("string"), $"k", $"n")
        .as[(String, String, Long)].collect().toSet
      assert(rows.contains(("2024-01-01 10:00:00", "a", 2L)))
    } finally q.stop()
  }

  test("funnelStream advances per-user stages across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[JourneyEvent]
    val q = funnelStream(input.toDS(), Seq("a", "b", "c"))
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_funnel"))
      .start()
    try {
      // batch 1: u1 does a then b (out of arrival order — seq decides);
      // u2 does b first (no advance: stage 0 expects 'a')
      input.addData(JourneyEvent(1, 2, "b"), JourneyEvent(1, 1, "a"),
        JourneyEvent(2, 1, "b"))
      q.processAllAvailable()
      // batch 2: u1 completes with c; u2 starts with a — state crossed
      // the batch boundary, so u1 must NOT need to re-see a/b
      input.addData(JourneyEvent(1, 3, "c"), JourneyEvent(2, 2, "a"))
      q.processAllAvailable()
      val got = spark.table("funnel_adv").as[FunnelProgress].collect()
        .groupBy(_.userId).view.mapValues(_.map(p => (p.stage, p.step)).sorted.toSeq).toMap
      assert(got(1L) === Seq((1, "a"), (2, "b"), (3, "c")))
      assert(got(2L) === Seq((1, "a")))
    } finally q.stop()
  }

  test("funnelStream stage counts agree with the batch funnel on real events") {
    implicit val sqlCtx = spark.sqlContext
    // the batch funnel chains on min(ts) strictly-after; feed the fold
    // seq = per-user ts-rank so the greedy matcher sees the same order
    val ranked = graft.Tables.events(spark, sf)
      .select($"user_id".as("userId"),
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
            .orderBy($"ts", $"event_id")).cast("long").as("seq"),
        $"event_type".as("eventType"))
      .as[JourneyEvent]
    val input = MemoryStream[JourneyEvent]
    val q = funnelStream(input.toDS(), Seq("signup", "view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_real")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("ckpt_funnel_real"))
      .start()
    try {
      input.addData(ranked.collect().toSeq)
      q.processAllAvailable()
      val streamed = spark.table("funnel_real").as[FunnelProgress]
        .groupByKey(_.stage).count().collect()
        .map { case (stage, n) => stage.toLong -> n }.toMap
      val batch = graft.ops.Behavior.funnel(graft.Tables.events(spark, sf),
          "user_id", "ts", "event_type", Seq("signup", "view", "click", "purchase"))
        .collect().map(r => r.getInt(0).toLong -> r.getLong(2)).toMap
      // batch reports users AT OR PAST each stage; streaming emits one
      // advance per stage reached — the same cumulative counts
      (1L to 4L).foreach { st =>
        assert(streamed.getOrElse(st, 0L) === batch(st),
          s"stage $st: streamed=${streamed.get(st)} batch=${batch.get(st)}")
      }
    } finally q.stop()
  }

  test("incrementalDedupQuery builds a deduped corpus with history-wide memory") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = tmp("inc_corpus") + "/corpus"
    val index = tmp("inc_index") + "/index"
    val input = MemoryStream[(Long, String)]
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    val textB = "one two three four five six seven eight nine"
    val textC = "totally different content with no overlap at all here"
    val ckpt = tmp("ckpt_incdedup")
    // AvailableNow snapshots the end offset AT START — data must land in
    // the MemoryStream before the query starts or the drain may see an
    // empty source (a real race, observed flaking)
    // batch 1: intra-batch dup (1, 2 same text) + unique (3)
    input.addData((1L, textA), (2L, textA), (3L, textB))
    val q = incrementalDedupQuery(spark, input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", corpus, index, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      q.awaitTermination()
      val after1 = spark.read.parquet(corpus).select("doc_id")
        .as[Long].collect().toSet
      assert(after1 === Set(1L, 3L), s"batch 1 kept $after1")
    } finally q.stop()
    // batch 2 — the next drain resumes from the SAME checkpoint (only
    // new offsets): a dup of HISTORY (4 = textA again) must be caught
    // via the index, new content (5) accepted
    input.addData((4L, textA), (5L, textC))
    val q2 = incrementalDedupQuery(spark, input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", corpus, index, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      q2.awaitTermination()
      val after2 = spark.read.parquet(corpus).select("doc_id")
        .as[Long].collect().toSet
      assert(after2 === Set(1L, 3L, 5L), s"batch 2 kept $after2")
    } finally q2.stop()
  }

  test("setSimIndexMaintenanceQuery: lossless history memory; probe flips after commit") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = tmp("ss_maint_corpus") + "/corpus"
    val index = tmp("ss_maint_index") + "/index"
    val ckpt = tmp("ckpt_ssmaint")
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "one two three four five six seven eight nine ten"
    val textC = "red orange yellow green blue indigo violet umber ochre teal"
    val textD = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    // drop-last-word twin: 7 of 8 shingles shared -> J = 7/8 >= 7/10
    def near(t: String) = t.split(" ").dropRight(1).mkString(" ")
    def drain(input: MemoryStream[(Long, String)]): Unit = {
      val q = setSimIndexMaintenanceQuery(spark,
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        corpus, index, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      try q.awaitTermination() finally q.stop()
    }
    def committed = spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSet
    val input = MemoryStream[(Long, String)]
    // batch 1: intra-batch near-dup (2 = twin of 1, keep-lowest-id) +
    // unique (3); the first accepted batch FREEZES the canonical order
    input.addData((1L, textA), (2L, near(textA)), (3L, textB))
    drain(input)
    assert(committed === Set(1L, 3L), s"batch 1 kept $committed")
    // the r17 verdict's exact scenario: a probe for content whose batch
    // has NOT committed yet must miss...
    val probeC = Seq((90L, near(textC))).toDF("doc_id", "text")
    def probeHits = graft.ops.Dedup.setSimAgainstIndex(
        probeC, "doc_id", "text", index,
        spark.read.parquet(corpus), 7, 10)
      .select($"id_b").as[Long].collect().toSet
    assert(probeHits.isEmpty, s"probe matched before commit: $probeHits")
    // batch 2: near-dup of HISTORY (4 = twin of textA, caught through
    // the index under the frozen order) + the probe's content (5)
    input.addData((4L, near(textA)), (5L, textC))
    drain(input)
    assert(committed === Set(1L, 3L, 5L), s"batch 2 kept $committed")
    // ...and catch the duplicate after its batch commits
    assert(probeHits === Set(5L), s"probe after commit: $probeHits")
    // batch 3 = the SECOND append under the frozen order
    input.addData((6L, textD))
    drain(input)
    assert(committed === Set(1L, 3L, 5L, 6L), s"batch 3 kept $committed")
    // frozen-order losslessness across >= 2 appended batches: the index
    // (order frozen at batch 1) must serve exactly what a direct
    // two-table join over the as-committed corpus finds
    val probes = Seq((91L, near(textA)), (92L, near(textB)),
      (93L, near(textC)), (94L, near(textD))).toDF("doc_id", "text")
    val corpusDf = spark.read.parquet(corpus).select($"doc_id", $"text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b", $"jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val direct = rows(graft.ops.Dedup.setSimJoinExactRS(
      probes, corpusDf, "doc_id", "text", 7, 10))
    val indexed = rows(graft.ops.Dedup.setSimAgainstIndex(
      probes, "doc_id", "text", index, corpusDf, 7, 10))
    assert(direct.map(t => (t._1, t._2)) ===
      Set((91L, 1L), (92L, 3L), (93L, 5L), (94L, 6L)), s"direct = $direct")
    assert(indexed === direct,
      s"missed ${(direct -- indexed).take(5)}; spurious ${(indexed -- direct).take(5)}")
  }

  test("incrementalDedupQuery migrates a flat pre-partitioned corpus into batch=legacy") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = tmp("inc_corpus_legacy") + "/corpus"
    val index = tmp("inc_index_legacy") + "/index"
    // a corpus written by the OLD flat layout: part files at the root
    Seq((100L, "legacy document text kept as is")).toDF("doc_id", "text")
      .write.parquet(corpus)
    val flatFiles = new java.io.File(corpus).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(flatFiles.nonEmpty, "fixture must start flat")
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "completely new content for the partitioned era"))
    val q = incrementalDedupQuery(spark, input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", corpus, index, tmp("ckpt_incdedup_legacy"),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try q.awaitTermination() finally q.stop()
    // without the migration, mixed flat + batch=... layouts make
    // partition discovery throw "conflicting directory structures"
    val rows = spark.read.parquet(corpus).select("doc_id", "batch")
      .as[(Long, String)].collect().toMap
    assert(rows.keySet === Set(100L, 1L), s"got $rows")
    assert(rows(100L) == "legacy", s"legacy row landed in batch=${rows(100L)}")
    assert(new java.io.File(corpus).listFiles().forall(f =>
      f.isDirectory || f.getName.startsWith("_") || f.getName.startsWith(".")),
      "no visible flat files may remain at the corpus root")
  }

  test("driftReport: zero drift for a matching mix, drift localized to the shifted category") {
    val ref = Map("a" -> 3.0, "b" -> 1.0)
    // batch mix == reference mix (any scale): smoothed p == smoothed q
    val same = driftReport(Seq("a", "a", "a", "b").toDF("src"), "src", ref).get
    assert(same.nDocs == 4 && same.nCats == 2)
    assert(math.abs(same.klBits) < 1e-12, s"kl=${same.klBits}")
    // all-b batch: drift, and the top term is b's overweight
    val skew = driftReport(Seq("b", "b", "b", "b").toDF("src"), "src", ref).get
    assert(skew.klBits > 1.0 && skew.topShiftCat == "b")
    // a category the reference never saw still scores finitely
    val novel = driftReport(Seq("zz", "zz").toDF("src"), "src", ref).get
    assert(novel.topShiftCat == "zz" && novel.klBits.isFinite
      && novel.klBits > skew.klBits)
    // empty batch: no report
    assert(driftReport(Seq.empty[String].toDF("src"), "src", ref).isEmpty)
  }

  test("cmsSketchStream: merged sketch equals the all-data sketch, exactly-once under replay") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val root = tmp("cms_root") + "/sketch"
    val ckpt = tmp("ckpt_cms")
    def drain(): Unit = {
      val q = cmsSketchStream(input.toDF().toDF("v"), "v", root, ckpt,
        d = 4, w = 8)
      try q.awaitTermination() finally q.stop()
    }
    val b1 = (0 until 50).map(i => s"k${i % 7}")
    val b2 = (0 until 80).map(i => s"k${i % 11}")
    input.addData(b1: _*); drain()
    input.addData(b2: _*); drain()
    val got = graft.etl.Versioned.readLatest(spark, root)
      .orderBy("j", "bucket").as[(Int, Long, Long)].collect().toSeq
    val want = graft.ops.Sketch.cmsSketch((b1 ++ b2).toDF("v"), "v", 4, 8)
      .orderBy("j", "bucket").as[(Int, Long, Long)].collect().toSeq
    assert(got == want, s"merged $got vs all-data $want")
    assert(graft.etl.Versioned.listVersions(spark, root).size == 2)
    // crash-replay window: re-publishing batch 1's tag must be skipped —
    // the batch body's own guard (versionForTag) sees it committed
    val ckptId = java.security.MessageDigest.getInstance("MD5")
      .digest(ckpt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    assert(graft.etl.Versioned.versionForTag(spark, root, s"$ckptId:0").nonEmpty)
    assert(graft.etl.Versioned.versionForTag(spark, root, s"$ckptId:1").nonEmpty)
  }

  test("driftMonitorQuery appends one replay-idempotent report row per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val reports = tmp("drift_reports") + "/reports"
    val ckpt = tmp("ckpt_drift")
    val ref = Map("a" -> 1.0, "b" -> 1.0)
    input.addData("a", "b", "a", "b")
    val q = driftMonitorQuery(input.toDF().toDF("src"), "src", ref,
      reports, ckpt)
    try q.awaitTermination() finally q.stop()
    input.addData("b", "b", "b", "b")
    val q2 = driftMonitorQuery(input.toDF().toDF("src"), "src", ref,
      reports, ckpt)
    try q2.awaitTermination() finally q2.stop()
    val rows = spark.read.parquet(reports)
      .select("batch_id", "n_docs", "kl_bits")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 2, s"got ${rows.toSeq}")
    assert(rows(0)._2 == 4 && math.abs(rows(0)._3) < 1e-12)
    assert(rows(1)._2 == 4 && rows(1)._3 > 0.5)
    // replaying a batch body rewrites its partition, never duplicates it
    driftReport(Seq("b", "b", "b", "b").toDF("src"), "src", ref).foreach { r =>
      graft.etl.Refresh.overwrite(
        Seq((r.nDocs, r.nCats, r.klBits, r.topShiftCat, r.topShiftBits))
          .toDF("n_docs", "n_cats", "kl_bits",
            "top_shift_cat", "top_shift_bits"),
        reports + "/batch_id=1")
    }
    assert(spark.read.parquet(reports).count() == 2)
  }
}
