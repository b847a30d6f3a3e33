package graft.etl

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The small-files doctor: fileStats must report per-partition file
  * counts/sizes that compact() then demonstrably fixes.
  */
class FileStatsSpec extends SparkSpec {

  private val base = s"${sys.props("java.io.tmpdir")}/graft_filestats"

  test("fileStats reports per-partition counts; compact collapses them") {
    val path = s"$base/part"
    // 4 files per l_returnflag partition — a deliberately fragmented extract
    Tables.lineitem(spark, sf).repartition(4)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    val before = Refresh.fileStats(spark, path)
    val rows = before.collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0).startsWith("l_returnflag=")))
    assert(rows.forall(_.getLong(1) >= 2), s"expected fragmentation: ${rows.toSeq}")
    assert(rows.forall(r => r.getLong(2) >= r.getLong(4) && r.getLong(4) >= r.getLong(3)))

    Refresh.compact(spark, path) // default target: everything here fits one file
    val after = Refresh.fileStats(spark, path).collect()
    assert(after.map(_.getString(0)).sorted === rows.map(_.getString(0)).sorted)
    assert(after.forall(_.getLong(1) === 1L), s"compact left fragments: ${after.toSeq}")
  }

  test("fileStats on a flat extract returns one row with empty partition key") {
    val path = s"$base/flat"
    Tables.region(spark, sf).repartition(3).write.mode("overwrite").parquet(path)
    val got = Refresh.fileStats(spark, path).collect()
    assert(got.length === 1 && got.head.getString(0) === "")
    assert(got.head.getLong(1) >= 1L && got.head.getLong(2) > 0L)
  }
}
