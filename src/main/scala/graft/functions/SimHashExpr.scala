package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a text column, one fused pass per row.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.9 tier b): the
  * relational formulation (explode tokens → per-token md5 → groupBy with
  * 64 ±1-vote sums, graft.ops.Dedup.simhash) shuffles the full token
  * stream and carries 64 aggregate columns; this expression keeps the
  * document on its partition and folds the votes in a local int array —
  * signature generation becomes pure map-side compute.
  *
  * Why 64 bits (not 32): banding at maxHamming = 1 splits the signature
  * into 2 bands, so the band key space is 2^(bits/2). 2^32 keys per band
  * spread a billion-document corpus at ~n/2^32 expected bucket occupancy;
  * 2^16 (the 32-bit geometry) puts every bucket over the super-bucket cap
  * at ~10^8 docs and the capped pipeline degenerates.
  *
  * Values are IDENTICAL to the relational form and the DuckDB oracle:
  * token hash = first 16 lowercase-hex digits of md5(token) parsed
  * base-16 (64-bit value, two's complement); tokens vote with
  * multiplicity; bit b of the result is set iff sum over tokens of
  * (bit b set ? +1 : -1) >= 0 (ties count as set). Split semantics match
  * `split(text, " ")` (empty words kept and hashed, as in the exploded
  * form).
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.simhash64($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  val Bits = 64

  /** Column-API entry point: `simhash($"text")`. */
  def apply(text: Column): Column = Shim.column(SimHash(Shim.expression(text)))

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def simhash64(text: UTF8String): Long = {
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
        // first 16 hex digits == first 8 digest bytes, big-endian
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
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
