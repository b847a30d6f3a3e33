package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a document as an array (with multiplicity,
  * in order) — the native form of the `transform(sequence(...),
  * concat_ws(element_at...))` composition in
  * [[graft.ops.TextAnalysis.shingleArrayComposable]]. Spark evaluates
  * array higher-order functions on the interpreted path (per-element
  * closure dispatch + an element_at probe per word of every shingle);
  * this expression emits each shingle as ONE byte-range slice of the
  * input — measured ~10x on the decontamination pipelines, same
  * split-keeps-empties semantics the DuckDB oracles encode (shared
  * construction notes: [[Shingles]]). Documents with fewer than `n`
  * words yield an empty array; same word-boundary scan as
  * [[Shingles.shingleSet]] but keeping duplicates and order.
  */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"need n>=1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingle_array"

  override def nullSafeEval(t: Any): Any =
    ShingleArray.shingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleArray.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.shingles($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {

  /** Column-API entry point: `ShingleArray($"text", n = 3)`. */
  def apply(text: Column, n: Int): Column =
    Shim.column(ShingleArray(Shim.expression(text), n))

  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    val (starts, words) = Shingles.wordStarts(bytes)
    val m = words - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      // shingle i = original byte range covering words [i, i+n) incl. separators
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + n) - 1 - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
