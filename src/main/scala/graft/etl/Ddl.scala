package graft.etl

import org.apache.spark.sql.SparkSession

/** S4 — DDL surface. The reference creates a Hyper schema + table per
  * extract before COPYing into it (app/core/importer.py:242-256,
  * `CreateMode.CREATE_AND_REPLACE`). Spark-native equivalent: session-
  * catalog databases plus EXTERNAL parquet tables registered over the
  * extract paths, so downstream SQL addresses extracts by name while the
  * data keeps living wherever the FileSystem URI points (the table is a
  * pointer, not a copy — dropping it never deletes the extract).
  */
object Ddl {

  private def quote(ident: String): String =
    ident.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")

  def createDatabase(spark: SparkSession, name: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${quote(name)}")
    ()
  }

  /** Register `path` (a parquet extract) as external table `table`
    * (optionally db-qualified). Schema comes from the parquet footers.
    * REPLACE semantics (the reference's CREATE_AND_REPLACE,
    * importer.py:242-246): re-registering after a republish points the
    * table at the NEW location — IF NOT EXISTS would silently keep
    * serving the stale path. External table: the drop never touches the
    * extract files.
    */
  def registerExtract(spark: SparkSession, table: String, path: String): Unit = {
    // Spark string literals escape with backslash, not SQL-standard ''
    val lit = path.replace("\\", "\\\\").replace("'", "\\'")
    dropTable(spark, table)
    spark.sql(
      s"CREATE TABLE ${quote(table)} USING parquet LOCATION '$lit'")
    ()
  }

  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${quote(table)}")
    ()
  }
}
