package graft.functions

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HS256 JSON Web Tokens in-engine (SURVEY §2 F8 — the reference mints and
  * checks JWTs on its API layer, `app/core/security.py`): signing and
  * verification as codegen'd expressions over the JDK's own HMAC-SHA256
  * (javax.crypto — no external dependency, no UDF, no driver round-trip).
  * Minting per-row export tokens or validating a token column over 10^9
  * rows is a pure map-side projection.
  *
  * Tokens are standard `base64url(header).base64url(payload).base64url(
  * hmac)` with the fixed header {"alg":"HS256","typ":"JWT"}; verification
  * recomputes the MAC over the exact received signing input (constant-time
  * compare) and returns the decoded payload, or NULL for malformed input
  * or a bad signature — the null-safe shape filters compose with.
  */
object Jwt {

  private val HeaderB64 = b64url(
    """{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))

  private def b64url(b: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  // one Mac per executor thread: getInstance per row would dominate the
  // projection; init+doFinal on a reused instance is the JDK-supported
  // reuse pattern
  private val macTl = new ThreadLocal[Mac] {
    override def initialValue(): Mac = Mac.getInstance("HmacSHA256")
  }

  private def hmac(data: String, secret: Array[Byte]): Array[Byte] = {
    val mac = macTl.get()
    mac.init(new SecretKeySpec(secret, "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8"))
  }

  /** header.payload.signature for a payload JSON string and secret;
    * null for an empty secret (Mac.init rejects empty keys — surface the
    * misconfiguration as the null-safe shape, not a task failure).
    */
  def sign(payload: UTF8String, secret: UTF8String): UTF8String = {
    if (secret.numBytes == 0) return null
    val p = b64url(payload.toString.getBytes("UTF-8"))
    val signingInput = s"$HeaderB64.$p"
    UTF8String.fromString(s"$signingInput.${b64url(hmac(signingInput, secret.getBytes))}")
  }

  /** Decoded payload when the signature verifies; null otherwise. */
  def verify(token: UTF8String, secret: UTF8String): UTF8String = {
    val parts = token.toString.split("\\.", -1)
    if (parts.length != 3) return null
    try {
      val expect = hmac(s"${parts(0)}.${parts(1)}", secret.getBytes)
      val got = java.util.Base64.getUrlDecoder.decode(parts(2))
      if (!java.security.MessageDigest.isEqual(expect, got)) return null
      UTF8String.fromBytes(java.util.Base64.getUrlDecoder.decode(parts(1)))
    } catch { case _: IllegalArgumentException => null }
  }
}

abstract class JwtBase extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  protected def helper: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Jwt.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $cls.$helper($a, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }
}

/** jwt_sign(payload_json, secret) → HS256 token. */
case class JwtSign(left: Expression, right: Expression) extends JwtBase {
  override def prettyName: String = "jwt_sign"
  override protected def helper: String = "sign"
  override def nullSafeEval(p: Any, s: Any): Any =
    Jwt.sign(p.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JwtSign =
    copy(left = l, right = r)
}

/** jwt_verify(token, secret) → payload JSON, or NULL if invalid. */
case class JwtVerify(left: Expression, right: Expression) extends JwtBase {
  override def prettyName: String = "jwt_verify"
  override protected def helper: String = "verify"
  override def nullSafeEval(t: Any, s: Any): Any =
    Jwt.verify(t.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JwtVerify =
    copy(left = l, right = r)
}

object JwtSign {
  def apply(payload: Column, secret: Column): Column =
    Shim.column(JwtSign(Shim.expression(payload), Shim.expression(secret)))
}

object JwtVerify {
  def apply(token: Column, secret: Column): Column =
    Shim.column(JwtVerify(Shim.expression(token), Shim.expression(secret)))
}
