package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram (shingle-set) overlap counts between two text columns:
  * `[|A∩B|, |A|, |B|]` in one fused pass — the shared kernel behind
  * every set-overlap measure (Jaccard = i/(a+b-i), containment = i/a,
  * overlap coefficient = i/min(a,b)). Sibling of [[ShingleJaccard]]
  * (same split semantics, same set construction — see its scaladoc for
  * why a native Expression beats the relational explode/join/groupBy
  * formulation on known pair lists); this one returns the raw counts so
  * the caller picks the measure without re-walking the texts.
  */
case class ShingleOverlap(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n >= 1, s"need n>=1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleOverlap.overlap(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleOverlap.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.overlap($a, $b, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleOverlap =
    copy(left = newLeft, right = newRight)
}

object ShingleOverlap {

  /** Column-API entry point: `ShingleOverlap($"a", $"b", n = 3)`. */
  def apply(a: Column, b: Column, n: Int): Column =
    Shim.column(ShingleOverlap(Shim.expression(a), Shim.expression(b), n))

  def overlap(a: UTF8String, b: UTF8String, n: Int): GenericArrayData = {
    val sa = Shingles.shingleSet(a, n)
    val sb = Shingles.shingleSet(b, n)
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    new GenericArrayData(Array[Any](inter.toLong, sa.size.toLong, sb.size.toLong))
  }

}
