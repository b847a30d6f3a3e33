package graft.functions

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** HS256 JWT expressions: RFC 7515 structure, round-trip, tamper
  * rejection, and agreement with a direct javax.crypto computation
  * (an independent path from the expression's codegen).
  */
class JwtSpec extends SparkSpec {
  import spark.implicits._

  private val secret = "graft-test-secret"
  private val payload = """{"sub":"file-42","scope":"export"}"""

  private def b64url(b: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  test("jwt_sign produces the RFC 7515 token a direct HMAC computation predicts") {
    val token = Seq(Tuple1(payload)).toDF("p")
      .select(JwtSign($"p", lit(secret)).as("t")).as[String].head()
    val Array(h, p, s) = token.split("\\.")
    assert(new String(java.util.Base64.getUrlDecoder.decode(h), "UTF-8") ===
      """{"alg":"HS256","typ":"JWT"}""")
    assert(new String(java.util.Base64.getUrlDecoder.decode(p), "UTF-8") === payload)
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes, "HmacSHA256"))
    assert(s === b64url(mac.doFinal(s"$h.$p".getBytes("UTF-8"))))
  }

  test("jwt_verify round-trips a signed column and rejects tampering") {
    val df = (1 to 50).map(i => s"""{"sub":"file-$i"}""").toDF("p")
      .select($"p", JwtSign($"p", lit(secret)).as("t"))
    // round-trip: verify(sign(p)) == p for every row
    assert(df.filter(JwtVerify($"t", lit(secret)) =!= $"p").isEmpty)
    // wrong secret → null
    assert(df.filter(JwtVerify($"t", lit("other")).isNotNull).isEmpty)
    // tampered payload (claims swapped, signature kept) → null
    val tampered = df.select(concat(
      substring_index($"t", ".", 2), lit("x."),
      substring_index($"t", ".", -1)).as("bad"))
    assert(tampered.filter(JwtVerify($"bad", lit(secret)).isNotNull).isEmpty)
    // malformed tokens → null, no throw
    val bad = Seq("", "a.b", "a.b.c.d", "not a token", "a.!!!.c").toDF("t")
    assert(bad.filter(JwtVerify($"t", lit(secret)).isNotNull).isEmpty)
    // empty secret → null on both sides, no task failure
    val empt = Seq(Tuple1(payload)).toDF("p")
      .select(JwtSign($"p", lit("")).as("t"))
    assert(empt.filter($"t".isNotNull).isEmpty)
    assert(df.filter(JwtVerify($"t", lit("")).isNotNull).isEmpty)
  }

  test("SQL surface: jwt_sign/jwt_verify registered via extensions") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      s"""SELECT jwt_verify(jwt_sign('$payload', '$secret'), '$secret') AS p""")
      .as[String].head()
    assert(got === payload)
  }
}
