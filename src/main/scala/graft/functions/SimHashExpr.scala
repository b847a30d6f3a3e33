package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit SimHash over a text column, one fused pass per row.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.9 tier b): the
  * relational formulation (explode tokens → per-token md5 → groupBy with
  * 32 ±1-vote sums, graft.ops.Dedup.simhash) shuffles the full token
  * stream and carries 32 aggregate columns; this expression keeps the
  * document on its partition and folds the votes in a local int array —
  * signature generation becomes pure map-side compute.
  *
  * Values are IDENTICAL to the relational form and the DuckDB oracle:
  * token hash = first 8 lowercase-hex digits of md5(token) parsed base-16
  * (32-bit value, zero-extended); tokens vote with multiplicity; bit b of
  * the result is set iff sum over tokens of (bit b set ? +1 : -1) >= 0
  * (ties count as set). Split semantics match `split(text, " ")` (empty
  * words kept and hashed, as in the exploded form).
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.simhash32($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  val Bits = 32

  /** Column-API entry point: `simhash($"text")`. */
  def apply(text: Column): Column = Shim.column(SimHash(Shim.expression(text)))

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def simhash32(text: UTF8String): Long = {
    val bytes = text.getBytes
    val md = mdLocal.get()
    val votes = new Array[Int](Bits)
    var start = 0
    var p = 0
    while (p <= bytes.length) {
      if (p == bytes.length || bytes(p) == ' '.toByte) {
        md.reset()
        md.update(bytes, start, p - start)
        val digest = md.digest()
        // first 8 hex digits == first 4 digest bytes, big-endian, unsigned
        val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        var b = 0
        while (b < Bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = p + 1
      }
      p += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
