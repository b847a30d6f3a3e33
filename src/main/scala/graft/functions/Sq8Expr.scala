package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Native symmetric int8 scalar quantization (the SQ8 storage tier):
  * `struct(scale = max|x| / 127, q = round(x / scale) as tinyint)` and
  * its inverse — fused single-loop expressions.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.9 tier b): the
  * composable formulation (graft.ops.Similarity.quantize8Hof) embeds the
  * `array_max` subtree INSIDE the per-element lambda, and higher-order
  * functions evaluate their lambda body per element with no
  * common-subexpression elimination across the lambda boundary — the
  * max|x| scan reruns for every element (O(d²) per row), and composing
  * `dequantize8(quantize8(v))` re-evaluates the whole quantize struct
  * per OUTER element (O(d³)-ish): a 128k-row × 64-dim corpus scan
  * measured 140 s interpreted vs sub-second here. These expressions do
  * one pass for the max, one for the codes, zero re-evaluation, inside
  * whole-stage codegen.
  *
  * Output values are IDENTICAL to the composable forms (same `round`
  * HALF_UP semantics via the same BigDecimal.valueOf path Spark's
  * `round` takes; null elements preserved; all-zero/empty vectors
  * quantize to scale 0.0 + zero codes) — GraftFunctionsSpec pins
  * native == HOF on fixtures and rounding-boundary values. One
  * deliberate difference: a NULL input vector yields a NULL struct here
  * (standard null-intolerant expression), where the HOF form produced
  * struct(0.0, NULL) — no caller stores or probes null vectors.
  */
case class Quantize8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${dt.simpleString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = mayHaveNullElems),
      nullable = false)))

  override def prettyName: String = "quantize8"

  override def nullSafeEval(input: Any): Any =
    Quantize8.quantize(input.asInstanceOf[ArrayData], elemIsFloat,
      mayHaveNullElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Quantize8.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.quantize($c, $elemIsFloat, $mayHaveNullElems);")
  }

  override protected def withNewChildInternal(newChild: Expression): Quantize8 =
    copy(child = newChild)
}

object Quantize8 {

  /** Column-API entry point. */
  def apply(vec: Column): Column = Shim.column(Quantize8(Shim.expression(vec)))

  /** Shared by interpreted eval and generated code — one compiled loop,
    * identical results on both paths.
    */
  def quantize(arr: ArrayData, isFloat: Boolean, checkNull: Boolean): InternalRow = {
    val n = arr.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      if (!(checkNull && arr.isNullAt(i))) {
        val v = math.abs(if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        if (v > maxabs) maxabs = v
      }
      i += 1
    }
    val out = new Array[Any](n)
    if (maxabs > 0) {
      i = 0
      while (i < n) {
        if (checkNull && arr.isNullAt(i)) out(i) = null
        else {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          // Spark round(_, 0) semantics exactly: BigDecimal.valueOf →
          // setScale(0, HALF_UP) — the oracle replays the same rounding.
          // Operation ORDER is load-bearing too: divide-then-multiply
          // (x / maxabs * 127.0), the exact order the HOF reference and
          // the DuckDB oracle use. x * (127.0/maxabs) is NOT bit-equal —
          // maxabs=3.0, x=0.22440944881889763 gives 9.4999…96 one way and
          // exactly 9.5 the other, flipping the HALF_UP code by 1
          // (NativeExprSpec pins this vector).
          out(i) = java.math.BigDecimal.valueOf(x / maxabs * 127.0)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toByte
        }
        i += 1
      }
    } else {
      // all-zero / empty / all-null vector: scale 0, zero codes for every
      // slot (the HOF otherwise-branch maps null elements to 0 too)
      i = 0
      while (i < n) { out(i) = 0.toByte; i += 1 }
    }
    val scale = if (maxabs > 0) maxabs / 127.0 else 0.0
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(out)))
  }
}

/** Inverse of [[Quantize8]]: `q * scale` back to array<double>, null
  * elements preserved. Field lookup is by NAME so structs read back from
  * a parquet index extract resolve regardless of field order.
  *
  * Null handling matches the HOF reference exactly: a null `q` field (or
  * null struct) yields a NULL array (`transform(null, …)` is null); a
  * null `scale` with non-null `q` — unreachable from [[Quantize8]] output
  * but reachable from structs read back from parquet — yields an array of
  * all-null elements (`x * NULL` per element), so the output element type
  * is nullable whenever either `q` elements or the `scale` field are.
  */
case class Dequantize8(child: Expression) extends UnaryExpression {

  private def fieldIdx(name: String): Int =
    child.dataType.asInstanceOf[StructType].fieldIndex(name)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fieldNames.contains("scale") &&
        s.fieldNames.contains("q") &&
        s(s.fieldIndex("scale")).dataType == DoubleType &&
        (s(s.fieldIndex("q")).dataType match {
          case ArrayType(ByteType, _) => true
          case _ => false
        }) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<scale: double, q: array<tinyint>>, " +
        s"got ${dt.simpleString}")
  }

  private def qContainsNull: Boolean =
    child.dataType.asInstanceOf[StructType](fieldIdx("q")).dataType
      .asInstanceOf[ArrayType].containsNull

  private def scaleNullable: Boolean =
    child.dataType.asInstanceOf[StructType](fieldIdx("scale")).nullable

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = qContainsNull || scaleNullable)

  // null on a null q field (mirroring the HOF transform-of-null), so the
  // default child-derived nullability is not enough
  override def nullable: Boolean = true

  override def prettyName: String = "dequantize8"

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    Dequantize8.dequantize(row, fieldIdx("scale"), fieldIdx("q"), qContainsNull)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Dequantize8.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val (si, qi) = (fieldIdx("scale"), fieldIdx("q"))
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $cls.dequantize($c, $si, $qi, $qContainsNull);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Dequantize8 =
    copy(child = newChild)
}

object Dequantize8 {

  /** Column-API entry point. */
  def apply(qv: Column): Column = Shim.column(Dequantize8(Shim.expression(qv)))

  /** Shared by interpreted eval and generated code. */
  def dequantize(row: InternalRow, scaleIdx: Int, qIdx: Int,
                 checkNull: Boolean): GenericArrayData = {
    if (row.isNullAt(qIdx)) return null
    val q = row.getArray(qIdx)
    val n = q.numElements()
    val out = new Array[Any](n)
    if (row.isNullAt(scaleIdx)) {
      // HOF parity: x * NULL scale = null per element, not a NULL array
      return new GenericArrayData(out)
    }
    val scale = row.getDouble(scaleIdx)
    var i = 0
    while (i < n) {
      out(i) = if (checkNull && q.isNullAt(i)) null
        else q.getByte(i).toDouble * scale
      i += 1
    }
    new GenericArrayData(out)
  }
}
