package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact word n-gram (shingle-set) Jaccard between two text columns,
  * computed per pair in one fused pass — the verification kernel of the
  * MinHash+LSH near-dup pipeline.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.9 tier b): the
  * relational formulation (explode both sides to (id, shingle) rows,
  * join on shingle, groupBy pair — graft.ops.Dedup.jaccardForPairs)
  * pays a 200× row blowup and two wide shuffles keyed on shingle text.
  * When the pair list is already known (LSH candidates, O(dups) pairs),
  * joining each pair to its two texts is two broadcast joins with NO
  * shuffle, and this expression does set-intersection locally.
  *
  * Values are IDENTICAL to the relational form and the DuckDB oracle:
  * distinct shingles per side (HashSet), |∩| / (|A| + |B| - |∩|) with
  * exact integer counts divided at double precision. Split semantics
  * match `split(text, " ")` / `string_split(text, ' ')` (empty words
  * kept). A side with fewer than n words has an empty set → Jaccard 0
  * (null if BOTH sides are empty, mirroring 0/0).
  */
case class ShingleJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n >= 1, s"need n>=1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "shingle_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleJaccard.jaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleJaccard.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("j")
      s"""
         |java.lang.Double $boxed = $cls.jaccard($a, $b, $n);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleJaccard =
    copy(left = newLeft, right = newRight)
}

object ShingleJaccard {

  /** Column-API entry point: `shingleJaccard($"a", $"b", n = 3)`. */
  def apply(a: Column, b: Column, n: Int): Column =
    Shim.column(ShingleJaccard(Shim.expression(a), Shim.expression(b), n))

  /** Null (the 0/0 case) only when both sides have no shingles. */
  def jaccard(a: UTF8String, b: UTF8String, n: Int): java.lang.Double = {
    val sa = Shingles.shingleSet(a, n)
    val sb = Shingles.shingleSet(b, n)
    if (sa.isEmpty && sb.isEmpty) return null
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    java.lang.Double.valueOf(
      inter.toDouble / (sa.size + sb.size - inter).toDouble)
  }

}
