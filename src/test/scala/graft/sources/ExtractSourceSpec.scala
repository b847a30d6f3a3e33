package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.{FileStatus, HyperFileMeta, MetaKeys, MetaStore}

class ExtractSourceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Catalog with two files: 1 servable, 2 unavailable; extract data
    * written at the provider's `<root>/extracts/<id>` convention.
    */
  private def freshCatalog(): String = {
    val root = java.nio.file.Files.createTempDirectory("extract_src").toString
    new MetaStore(spark, root).initHyperFiles(Seq(
      HyperFileMeta(1L, 10L, 100L, "submissions.hyper", FileStatus.FileAvailable,
        isActive = true, Map(MetaKeys.SyncFailures -> "0"), ts("2024-01-01 00:00:00")),
      HyperFileMeta(2L, 10L, 200L, "broken.hyper", FileStatus.FileUnavailable,
        isActive = false, Map.empty, ts("2024-01-01 00:00:00"))))
    val data = Seq((1L, "alice", 3.5), (2L, "bob", 1.25), (3L, "carol", 9.0))
      .toDF("sub_id", "who", "score")
    graft.etl.Refresh.overwrite(data, ExtractDataSource.extractDir(root, 1L))
    root
  }

  test("reads an extract by filename through the registered short name") {
    val root = freshCatalog()
    val df = spark.read.format("graft_extract")
      .option("catalog", root).option("file", "submissions.hyper").load()
    assert(df.orderBy("sub_id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "alice", 3.5), (2L, "bob", 1.25), (3L, "carol", 9.0)))
  }

  test("reads by file id and by direct path") {
    val root = freshCatalog()
    val byId = spark.read.format("graft_extract")
      .option("catalog", root).option("file", "1").load()
    val byPath = spark.read.format("graft_extract")
      .option("path", ExtractDataSource.extractDir(root, 1L)).load()
    assert(byId.count() == 3 && byPath.count() == 3)
  }

  test("pure SQL clients SELECT an extract with no graft API in sight") {
    val root = freshCatalog()
    // the standard V2 SQL flow: register once, query forever — the
    // provider resolves the catalog + guard at every scan
    spark.sql("DROP TABLE IF EXISTS submissions_extract")
    spark.sql(
      s"""CREATE TABLE submissions_extract USING graft_extract
         |OPTIONS (catalog '$root', file 'submissions.hyper')""".stripMargin)
    try {
      val rows = spark.sql(
        "SELECT who, score FROM submissions_extract WHERE score > 2 ORDER BY sub_id")
        .as[(String, Double)].collect().toSeq
      assert(rows == Seq(("alice", 3.5), ("carol", 9.0)))
    } finally spark.sql("DROP TABLE IF EXISTS submissions_extract")
  }

  test("availability guard: unavailable/inactive files fail resolution (404 semantics)") {
    val root = freshCatalog()
    val e = intercept[Exception] {
      spark.read.format("graft_extract")
        .option("catalog", root).option("file", "broken.hyper").load()
    }
    assert(e.getMessage.contains("not servable"), e.getMessage)
    val missing = intercept[Exception] {
      spark.read.format("graft_extract")
        .option("catalog", root).option("file", "nope.hyper").load()
    }
    assert(missing.getMessage.contains("no catalog entry"), missing.getMessage)
  }

  test("the delegated scan keeps parquet pushdown and pruning") {
    val root = freshCatalog()
    val df = spark.read.format("graft_extract")
      .option("catalog", root).option("file", "1").load()
      .filter(col("score") > 2.0).select("who")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(score), GreaterThan(score,2.0)]"),
      s"filter not pushed to the delegated parquet scan:\n${p.take(800)}")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("sub_id"),
      s"scan reads pruned columns: $readSchema")
  }
}
