package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): the memory-side ANN
  * scale lever. A D-dim vector splits into `m` subvectors; each
  * subvector is replaced by the index of its nearest codeword in that
  * subspace's `ks`-entry codebook — the corpus shrinks from `8·D` bytes
  * per vector to `m` small codes, so a 100 TB embedding corpus's index
  * fits in cluster memory and the scan becomes table lookups instead of
  * float math against raw vectors.
  *
  * Codebooks travel as one `array<array<double>>` literal/column of
  * `m·ks` codewords in subspace-major order (codeword `c` of subspace
  * `mi` at index `mi·ks + c`), each of length `D/m` — broadcast by
  * value inside the plan, never a driver-side lookup at eval time.
  *
  * Both kernels fold doubles in ascending index order, so the DuckDB
  * oracle's ordered `list_sum(list_transform(range(...)))` replays them
  * bit-for-bit. Ties in the argmin break to the SMALLEST codeword index
  * (the oracle's `ORDER BY dist, c`).
  */
object Pq {

  /** `codes[mi] = argmin_c L2²(vec[mi·dsub..], cb[mi·ks+c])`. */
  def encode(vec: ArrayData, cb: ArrayData, ks: Int): GenericArrayData = {
    val n = cb.numElements()
    require(ks > 0 && n % ks == 0, s"codebook size $n not a multiple of ks=$ks")
    val m = n / ks
    val d = vec.numElements()
    require(m > 0 && d % m == 0, s"dim $d not a multiple of m=$m subspaces")
    val dsub = d / m
    var nc = 0
    while (nc < d) {
      require(!vec.isNullAt(nc), s"null vector component at $nc")
      nc += 1
    }
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < ks) {
        val w = cb.getArray(mi * ks + c)
        require(w.numElements() == dsub,
          s"codeword ${mi * ks + c} has ${w.numElements()} dims, expected $dsub")
        var dist = 0.0d
        var i = 0
        while (i < dsub) {
          val diff = vec.getDouble(base + i) - w.getDouble(i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric distance: `Σ_mi L2²(q[mi·dsub..], cb[mi·ks+codes[mi]])`
    * — the query stays RAW, only the corpus is quantized, so no query-
    * side quantization error enters the estimate.
    */
  def adc(q: ArrayData, codes: ArrayData, cb: ArrayData, ks: Int): Double = {
    val m = codes.numElements()
    val d = q.numElements()
    require(m > 0 && d % m == 0, s"dim $d not a multiple of m=$m subspaces")
    val dsub = d / m
    // mirror encode's per-component guard: getDouble reads a null slot
    // as 0.0, which would silently skew EVERY distance instead of failing
    var nc = 0
    while (nc < d) {
      require(!q.isNullAt(nc), s"null query component at $nc")
      nc += 1
    }
    var total = 0.0d
    var mi = 0
    while (mi < m) {
      require(!codes.isNullAt(mi), s"null code at subspace $mi")
      val code = codes.getInt(mi)
      require(code >= 0 && code < ks && mi * ks + code < cb.numElements(),
        s"code $code out of range for ks=$ks at subspace $mi")
      val w = cb.getArray(mi * ks + code)
      require(w.numElements() == dsub,
        s"codeword ${mi * ks + code} has ${w.numElements()} dims, expected $dsub")
      val base = mi * dsub
      var dist = 0.0d
      var i = 0
      while (i < dsub) {
        val diff = q.getDouble(base + i) - w.getDouble(i)
        dist += diff * diff
        i += 1
      }
      total += dist
      mi += 1
    }
    total
  }
}

/** `pq_encode(vec, codebooks, ks)` → `array<int>` of `len(codebooks)/ks`
  * codes. See [[Pq]].
  */
case class PqEncode(left: Expression, right: Expression, ks: Int)
  extends BinaryExpression {

  require(ks > 0, s"need ks>0, got $ks")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<array<double>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any, c: Any): Any =
    Pq.encode(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Pq.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (v, c) => s"${ev.value} = $cls.encode($v, $c, $ks);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `pq_adc(query, codes, codebooks, ks)` → double squared-L2 estimate.
  * See [[Pq]].
  */
case class PqAdc(first: Expression, second: Expression, third: Expression,
                 ks: Int) extends TernaryExpression {

  require(ks > 0, s"need ks>0, got $ks")

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<int>, " +
          s"array<array<double>>), got (${a.simpleString}, " +
          s"${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc"

  override def nullSafeEval(q: Any, codes: Any, cb: Any): Any =
    Pq.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Pq.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      (q, codes, cb) => s"${ev.value} = $cls.adc($q, $codes, $cb, $ks);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): PqAdc =
    copy(first = f, second = s, third = t)
}

object PqEncode {
  /** Column-API entry point. */
  def apply(vec: Column, codebooks: Column, ks: Int): Column =
    Shim.column(PqEncode(Shim.expression(vec), Shim.expression(codebooks), ks))
}

object PqAdc {
  /** Column-API entry point. */
  def apply(query: Column, codes: Column, codebooks: Column, ks: Int): Column =
    Shim.column(PqAdc(Shim.expression(query), Shim.expression(codes),
      Shim.expression(codebooks), ks))
}
