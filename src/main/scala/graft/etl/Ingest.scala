package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** CSV ingest with the reference's null policy.
  *
  * The reference reads each export with `pd.read_csv(path,
  * na_values=["n/a", ""])` (reference: app/core/importer.py:61-62): both the
  * literal string "n/a" and the empty string are nulls. Spark's csv reader
  * accepts a single `nullValue`, so the second sentinel is applied as a
  * post-read `when(c.isin(...), null)` pass — a codegen'd projection, no
  * second materialization (the reference's rewrite-the-CSV staging step,
  * importer.py:68-73, is unnecessary here).
  */
object Ingest {

  val NullSentinels: Seq[String] = Seq("n/a", "")

  /** Null-normalize one string column: "n/a" and "" become null. */
  def nullify(c: Column): Column =
    when(c.isin(NullSentinels.map(lit): _*), lit(null).cast(StringType))
      .otherwise(c)

  /** Apply [[nullify]] to every string column of `df`. */
  def normalizeNulls(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      // backtick-escaped like TypePolicy: CSV headers are arbitrary
      // strings and a dotted name would parse as struct access
      if (f.dataType == StringType)
        nullify(col("`" + f.name.replace("`", "``") + "`")).as(f.name)
      else col("`" + f.name.replace("`", "``") + "`")
    }
    df.select(cols.toSeq: _*)
  }

  /** Read newline-delimited JSON — the de-facto LLM-corpus interchange
    * format (one document object per line; nested metadata as typed
    * structs, dot-path projectable and prunable). The schema is REQUIRED:
    * at 100 TB, inference would scan the corpus twice and silently widen
    * on dirty lines; corpora ship with a declared schema. Missing keys
    * read as null (JSON's own null policy — the CSV sentinel pass does
    * not apply).
    */
  def readJsonl(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)

  /** Read a CSV export the way the reference does: header row, inferred
    * schema, nulls normalized, types collapsed to {long, double, string}.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      // first sentinel handled by the reader itself ...
      .option("nullValue", "n/a")
      .csv(path)
    // ... empty string + type collapse in one projection pass.
    TypePolicy(normalizeNulls(raw))
  }
}
