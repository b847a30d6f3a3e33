package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hashed-linear classifier margin (the fastText/DCLM serving
  * shape): lowercase, whitespace-tokenize, hash each token to a bucket
  * (first 32 bits of md5, mod `weights.length`), sum the bucket weights,
  * divide by the token count — one fused per-row pass.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.9 tier b): the
  * composable formulation (graft.ops.TextAnalysis.hashedClassifierMargin's
  * HOF reference form) evaluates an md5 + hex-string `conv` chain per
  * token inside an interpreted `aggregate` lambda — and the stand-in
  * weight derivation pays a SECOND md5 per token. This kernel feeds one
  * reused MessageDigest the token bytes directly, reads the bucket from
  * the digest's first 4 bytes with no hex-string round-trip, and looks
  * the weight up in a plain double[].
  *
  * Output values are IDENTICAL to the composable forms: every weight is
  * an exact multiple of 2⁻³¹ so the fold never rounds (any summation
  * order agrees) and the single closing division is correctly rounded.
  * The no-rounding claim is conditional on the running sum staying inside
  * the exact-integer range of the 2⁻³¹ grid: with |w| ≤ ~2, |sum|·2³¹
  * stays below 2⁵³ while a document has fewer than ~2²¹ (~2M) tokens —
  * past that bound, token-order folds can diverge from an unordered sum
  * (the Pack.ChecksumPrime caveat pattern; no fixture or real corpus doc
  * approaches it, and q_token_budget enforces far smaller packing caps) —
  * ExtensionsSpec pins bit-equality against the hand fold and the HOF
  * path. Tokenization matches `split(lower(text), " ")` exactly: split
  * on every single space, empty tokens KEPT (an empty string is one
  * empty token — md5("") has a bucket like any other). NULL text yields
  * NULL margin.
  */
case class HashedLinearMargin(child: Expression, weights: Seq[Double])
    extends UnaryExpression {

  require(weights.nonEmpty, "need a non-empty weight table")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "hashed_linear_margin"

  // one conversion per expression instance, shared by eval and codegen
  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def nullSafeEval(input: Any): Any =
    HashedLinearMargin.margin(input.asInstanceOf[UTF8String], wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HashedLinearMargin.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val wRef = ctx.addReferenceObj("marginWeights", wArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.margin($c, $wRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearMargin =
    copy(child = newChild)
}

object HashedLinearMargin {

  /** Column-API entry point. */
  def apply(text: Column, weights: Array[Double]): Column =
    Shim.column(HashedLinearMargin(Shim.expression(text), weights.toSeq))

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code. */
  def margin(text: UTF8String, w: Array[Double]): Double = {
    // UTF8String.toLowerCase == Spark's lower(); the String round-trip
    // is one allocation per ROW (the HOF path allocated per token)
    val s = text.toLowerCase.toString
    val md = mdLocal.get()
    val dim = w.length
    var sum = 0.0
    var nToks = 0L
    var start = 0
    val len = s.length
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        md.reset()
        val h = md.digest(tok.getBytes("UTF-8"))
        // first 4 digest bytes big-endian == parseLong(hex.take(8), 16)
        val h32 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        sum += w((h32 % dim).toInt)
        nToks += 1
        start = i + 1
      }
      i += 1
    }
    sum / nToks.toDouble
  }
}
