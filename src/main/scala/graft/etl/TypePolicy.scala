package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pandas-compatible type-collapse policy.
  *
  * The reference infers a schema per sync with `pandas.convert_dtypes()` and
  * then maps dtype *kinds* onto exactly three storage types — int64 →
  * BIG_INT, float64 → DOUBLE, everything else → TEXT (reference:
  * app/core/importer.py:38-51, docstring at :56-58 "returns every column as
  * a string column" except ints/floats).
  *
  * Spark's `inferSchema` is strictly richer (dates, booleans, decimals);
  * to be semantics-compatible we collapse every inferred type down to
  * {LongType, DoubleType, StringType}:
  *   - integral types (byte/short/int/long)      → LongType
  *   - fractional types (float/double/decimal)   → DoubleType
  *   - everything else (bool, date, ts, string)  → StringType
  *
  * The collapse is a pure projection of `cast` expressions — fully
  * codegen'd, no UDFs, stays inside WholeStageCodegen at any scale.
  */
object TypePolicy {

  /** The collapsed Spark type for an inferred type. */
  def collapse(dt: DataType): DataType = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => LongType
    case _: FloatType | _: DoubleType | _: DecimalType             => DoubleType
    case _                                                         => StringType
  }

  /** Apply the collapse policy to every column of `df`. Column refs are
    * backtick-escaped (the Profile.numeric convention): this runs on
    * Ingest.readCsv output whose headers are arbitrary survey strings —
    * a bare col("price.usd") parses the dot as struct access and throws
    * UNRESOLVED_COLUMN on every such export.
    */
  def apply(df: DataFrame): DataFrame = {
    def in(c: String) = col("`" + c.replace("`", "``") + "`")
    val cols = df.schema.fields.map { f =>
      val target = collapse(f.dataType)
      if (target == f.dataType) in(f.name)
      else in(f.name).cast(target).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }
}
