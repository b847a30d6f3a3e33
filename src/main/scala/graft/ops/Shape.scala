package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Response/column shaping operators.
  *
  * The reference shapes output via Pydantic field subset+rename
  * (app/schemas/hyperfile.py:23-34,62-73 and the "labels as headers"
  * export option), strips XLSForm group prefixes from headers
  * (`remove_group_name`, app/schemas/configuration.py:7), and converts
  * select-multiple answers between a single space-delimited column and
  * split 0/1 columns (app/schemas/configuration.py:8,11-13).
  *
  * All pure projections / conditional aggregations — codegen'd end to end.
  */
object Shape {

  /** P6: projection + rename. `labels` maps source column → output label;
    * unlisted columns are dropped (the Pydantic-subset behavior).
    */
  def renameLabels(df: DataFrame, labels: Seq[(String, String)]): DataFrame =
    df.select(labels.map { case (src, label) => col(src).as(label) }: _*)

  /** F2: strip the XLSForm group prefix from a header: "hh/name" → "name".
    * Applied to column NAMES (schema transform, zero data movement).
    */
  def removeGroupName(name: String): String = name.replaceAll("^.*/", "")

  def removeGroupNames(df: DataFrame): DataFrame = {
    // leaf-name collisions ("hh/name" and "resp/name" both strip to
    // "name") would select two identically-named columns — every later
    // col("name")/join/write then throws AMBIGUOUS_REFERENCE far from
    // the cause; fail here naming the colliding headers
    val stripped = df.columns.map(c => c -> removeGroupName(c))
    val dupes = stripped.groupBy(_._2).filter(_._2.length > 1)
    require(dupes.isEmpty,
      "group-prefix strip collides: " + dupes.map { case (leaf, cs) =>
        s"'$leaf' <- ${cs.map(_._1).mkString("{", ", ", "}")}" }.mkString("; "))
    df.select(stripped.map { case (c, n) => col(c).as(n) }.toSeq: _*)
  }

  /** F2 value-level form (same regex, usable inside an oracle-checked
    * query): strip everything up to the last '/'.
    */
  def removeGroupPrefix(c: Column): Column = regexp_replace(c, "^.*/", "")

  /** F3: select-multiple "value" shape — one space-delimited string column
    * becomes an ArrayType column.
    */
  def selectMultipleToArray(c: Column): Column = split(c, " ")

  /** F4: select-multiple "split" shape — explode the value form into 0/1
    * indicator columns, one per option in `options`. Conditional
    * aggregation (partial map-side combine), not a pivot shuffle per
    * option.
    */
  def splitIndicators(c: Column, options: Seq[String]): Seq[Column] =
    options.map(o => max(when(array_contains(split(c, " "), o), 1).otherwise(0)).as(o))
}
