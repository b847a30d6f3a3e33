package graft.sources

import java.util

import org.apache.spark.sql.{SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{FileStatus, MetaStore}

/** DataSource V2 `TableProvider` for the extract catalog: lets ANY Spark
  * SQL client `SELECT` a managed extract by file name or id without
  * touching graft APIs —
  *
  * {{{
  *   CREATE TABLE subs USING graft_extract
  *     OPTIONS (catalog '/data/catalog', file 'submissions.hyper');
  *   SELECT * FROM subs;  -- re-resolves catalog + guard at every scan
  *   spark.read.format("graft_extract")
  *     .option("catalog", "/data/catalog").option("file", "42").load()
  *   spark.read.format("graft_extract").option("path", extractDir).load()
  * }}}
  *
  * This closes the reference's serving-surface gap (file.py:91-114 serves
  * extracts over HTTP) Spark-natively: resolution + the availability
  * guard happen here, the bytes go through Spark's own parquet source.
  *
  * Semantics mapped from the reference:
  *  - lookup by file id or filename in the catalog (`hyperfiles` table);
  *  - the availability guard: the reference 404s a download unless the
  *    file is `file_available` (file.py:188-199) — here an inactive or
  *    unavailable file fails resolution with the status in the message.
  *
  * Scale posture: the catalog read is catalog-sized (KBs); the data path
  * DELEGATES to Spark's own `ParquetTable`, so vectorized reads, filter
  * pushdown, column pruning and partition pruning are exactly those of
  * `spark.read.parquet` — this provider adds only name resolution and
  * the guard, never a slower byte path. (ParquetTable lives in Spark's
  * `execution` package — internal API, same caveat as the graftshim
  * accessors, pinned by ExtractSourceSpec.)
  */
class ExtractDataSource extends TableProvider with DataSourceRegister with RelationProvider {

  override def shortName(): String = "graft_extract"

  // schema always comes from the resolved extract's parquet footers
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    resolve(new CaseInsensitiveStringMap(properties))

  private def resolve(options: CaseInsensitiveStringMap): ParquetTable = {
    val spark = SparkSession.active
    val dir = ExtractDataSource.resolveExtractDir(spark, options)
    ParquetTable(s"graft_extract($dir)", spark, options, Seq(dir),
      userSpecifiedSchema = None, fallbackFileFormat = classOf[ParquetFileFormat])
  }

  /** V1 face: `CREATE TABLE ... USING graft_extract OPTIONS (...)` and
    * session-catalog table scans resolve through RelationProvider — same
    * catalog resolution + guard, delegated to a parquet HadoopFsRelation
    * (pushdown/pruning identical to the V2 read path).
    */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    import scala.jdk.CollectionConverters._
    val spark = sqlContext.sparkSession
    val dir = ExtractDataSource.resolveExtractDir(
      spark, new CaseInsensitiveStringMap(parameters.asJava))
    org.apache.spark.sql.execution.datasources.DataSource(
      spark, className = "parquet", paths = Seq(dir)).resolveRelation()
  }
}

object ExtractDataSource {

  /** Option keys: either `path` (a direct extract dir) or `catalog` (a
    * MetaStore root) plus `file` (file id or filename).
    */
  val PathOpt = "path"
  val CatalogOpt = "catalog"
  val FileOpt = "file"

  /** Where a catalog's extracts live: `<root>/extracts/<fileId>` — the
    * layout [[graft.etl.Refresh.overwrite]] writers and this provider
    * agree on.
    */
  def extractDir(catalogRoot: String, fileId: Long): String =
    s"$catalogRoot/extracts/$fileId"

  private[sources] def resolveExtractDir(spark: SparkSession,
                                         options: CaseInsensitiveStringMap): String = {
    // catalog resolution wins over `path`: the session catalog injects a
    // managed-table location as `path` when reloading a CREATE TABLE'd
    // extract, and that empty directory must not shadow the real extract
    (Option(options.get(CatalogOpt)), Option(options.get(PathOpt))) match {
      case (Some(root), _) =>
        val file = Option(options.get(FileOpt)).getOrElse(
          throw new IllegalArgumentException(
            s"graft_extract: option '$FileOpt' (file id or filename) is required with '$CatalogOpt'"))
        lookup(spark, root, file)
      case (None, Some(p)) => p
      case _ =>
        throw new IllegalArgumentException(
          s"graft_extract: specify either '$PathOpt' or '$CatalogOpt' + '$FileOpt' " +
            s"(got keys: ${options.keySet()})")
    }
  }

  private def lookup(spark: SparkSession, root: String, file: String): String = {
    // catalog-sized read (the reference's Postgres lookup, file.py:91-99)
    val metas = new MetaStore(spark, root).readHyperFiles().collect()
    // DETERMINISTIC resolution precedence: id match first, then filename,
    // each tie-broken to the lowest id. One combined find() over an
    // unordered collect() would resolve a numeric filename vs another
    // file's id by parquet task order — the same CREATE TABLE serving
    // different extracts across restarts.
    val m = metas.filter(_.id.toString == file).sortBy(_.id).headOption
      .orElse(metas.filter(_.filename == file).sortBy(_.id).headOption)
      .getOrElse(throw new NoSuchElementException(
        s"graft_extract: no catalog entry for '$file' under $root"))
    // availability guard (the reference 404s unless file_available)
    require(m.isActive && m.fileStatus == FileStatus.FileAvailable,
      s"graft_extract: file ${m.id} (${m.filename}) is not servable: " +
        s"status=${m.fileStatus}, active=${m.isActive}")
    extractDir(root, m.id)
  }
}
