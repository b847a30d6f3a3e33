package graft.queries

/** Scratch paths for queries that WRITE their own input as a side effect
  * (the CSV/JSONL ingest round-trips, the incremental band index).
  *
  * Paths are rooted at `java.io.tmpdir` and scoped by the sf dir's
  * basename, so a bench run at sf0.1 and a correctness run at sf0.01
  * never race on the same files. Oracle SQL that reads a fixture embeds
  * [[SfToken]] in place of the sf basename; [[render]] — called by
  * [[graft.Verify]] when dumping `oracle_sql.json`, i.e. after every
  * Spark query ran and produced its fixture — substitutes the actual
  * value. Ordering note: a fixture-reading oracle is only meaningful
  * AFTER the Spark side ran; the driver's contract (Verify materializes
  * all query results, then DuckDB replays the dumped SQL) guarantees
  * exactly that.
  */
object Fixtures {

  /** Placeholder for the sf basename inside oracle SQL. */
  val SfToken = "__GRAFT_SF__"

  private def tmp = sys.props("java.io.tmpdir").stripSuffix("/")

  /** Fixture dir for the Spark side of a query, unique per sf dir. */
  def dir(name: String, sfDir: String): String =
    s"$tmp/graft_${name}_${new java.io.File(sfDir).getName}"

  /** The same path with the sf basename as a token — for oracle SQL. */
  def sqlDir(name: String): String = s"$tmp/graft_${name}_$SfToken"

  /** Resolve [[SfToken]] in oracle SQL against the run's actual sf dir. */
  def render(sql: String, sfDir: String): String =
    sql.replace(SfToken, new java.io.File(sfDir).getName)

  /** Build-once guard with an ATOMIC publish: `build` writes into a
    * temp sibling, the marker lands inside it, and ONE rename puts the
    * complete fixture at `root`. The old check-then-act on the marker
    * let two concurrent builders (a dev `only` Verify next to a full
    * run) both pass the exists() check and build INTO root — for the
    * versioned-diff store that meant duplicate v1/v2 publishes
    * corrupting the version list, permanently hidden once the marker
    * landed. Under ATOMIC_MOVE the loser's rename fails and its temp
    * is discarded; a marker-less root (pre-fix debris, crashed build)
    * is deleted before building.
    */
  private def ensureOnce(root: String, marker: String)(
      build: String => Unit): String = {
    val rootPath = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(rootPath.resolve(marker))) {
      if (java.nio.file.Files.exists(rootPath))
        org.apache.commons.io.FileUtils.deleteDirectory(rootPath.toFile)
      val tmpRoot = root + ".build-" + java.util.UUID.randomUUID().toString.take(8)
      build(tmpRoot)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmpRoot, marker), Array.emptyByteArray)
      try java.nio.file.Files.move(java.nio.file.Paths.get(tmpRoot), rootPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileSystemException =>
          // another builder won the race — its complete fixture stands
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmpRoot))
      }
    }
    root
  }

  /** Materialize the binary-file landing fixture (first 20 docs' UTF-8
    * bytes as `docNNN.bin`) exactly once per sf dir — guarded by a
    * marker written LAST, so Verify/Bench reruns and concurrent queries
    * see either nothing (and build it) or a complete fixture, and the
    * querying body itself stays a pure `binaryFile` read. The bounded
    * 20-row collect lives HERE, in setup, not in any timed query body.
    */
  def ensureBlobs(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    ensureOnce(dir("blob_fixture", sfDir), "_COMPLETE") { tmpRoot =>
      new java.io.File(tmpRoot).mkdirs()
      graft.Tables.documents(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("doc_id") < 20)
        .select("doc_id", "text").collect().foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmpRoot, f"doc${r.getLong(0)}%03d.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
    }

  /** Materialize a two-version snapshot store for the CDC diff query
    * exactly once per sf dir: v_first = docs under 300; v_second drops
    * every 17th, uppercases every (surviving) 13th, and inserts 30 new
    * keys at +10000 — all pure functions of the documents table, so the
    * DuckDB oracle recomputes both snapshots logically and never reads
    * the store. The marker is written LAST (underscore-prefixed, so
    * parquet readers ignore it); the publishes go through the REAL
    * [[graft.etl.Versioned.publish]] path — manifest, atomic pointer
    * flip — which is the point: the diff query exercises version reads,
    * not a synthetic pair of DataFrames.
    */
  def ensureVersionedDiff(spark: org.apache.spark.sql.SparkSession,
                          sfDir: String): String = {
    import org.apache.spark.sql.functions._
    ensureOnce(dir("vdiff", sfDir), "_FIXTURE_COMPLETE") { root =>
      val docs = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).filter(col("doc_id") < 300)
      graft.etl.Versioned.publish(docs, root, tag = Some("v1"))
      val v2 = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, upper(col("text")))
            .otherwise(col("text")).as("text"))
        .unionByName(graft.Tables.documents(spark, sfDir)
          .filter(col("doc_id") < 30)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      graft.etl.Versioned.publish(v2, root, tag = Some("v2"))
      ()
    }
  }

  /** Z-order curve parameters for the documents layout: 10 bits per
    * dimension (doc stats stay well under 1024 at every SF — per-doc
    * lengths don't grow with corpus size), cells = top 2×3 bits (an
    * 8×8 quadtree grid, cell width 128 per dimension).
    */
  val ZBits = 10
  val ZCells = 3

  /** Materialize the documents corpus Z-clustered on
    * (n_chars, token_count) exactly once per sf dir — the curation
    * slice layout: both length filters prune at the source. Same
    * marker discipline as [[ensureBlobs]]; the layout write is setup,
    * never part of a timed query body. The derived token_count column
    * is `size(split(text, ' '))`, the engine-portable count the DuckDB
    * oracle re-derives as `len(string_split(text, ' '))`.
    */
  def ensureZLayout(spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    ensureOnce(dir("zorder_docs", sfDir), "_COMPLETE") { root =>
      val docs = graft.Tables.documents(spark, sfDir)
        .withColumn("token_count", graft.ops.TextAnalysis.tokenCount(col("text")))
      graft.ops.Layout.writeZClustered(
        docs, "n_chars", "token_count", ZBits, ZCells, root)
    }
  }
}
