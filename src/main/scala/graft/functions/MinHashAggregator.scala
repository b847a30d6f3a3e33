package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed `Aggregator[IN, BUF, OUT]` — the UDAF
  * surface of SURVEY.md §2.9: one buffer holds all k component minima and
  * is merged associatively across partitions (map-side partial combine
  * for free).
  *
  * NOTE on the preference order (prompt: native Expression > UDF/UDAF):
  * the production path (graft.ops.Dedup.minhashSignature) expresses the
  * same computation as k codegen'd `min(md5(...))` aggregates, which
  * whole-stage-codegen fuses; this Aggregator exists as the typed-API
  * formulation (useful from Dataset code and as the §2.9 capability
  * demonstration) and is spec-verified to produce identical signatures.
  */
class MinHashAggregator(k: Int)
    extends Aggregator[String, Array[String], Array[String]] {

  // chunked-md5 scheme supports only k*sigWidth(k) <= 32 (k <= 8)
  graft.ops.Dedup.requireChunkableK(k)

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  override def zero: Array[String] = Array.fill(k)(null)

  private val width = graft.ops.Dedup.sigWidth(k)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    // one digest per shingle; component i = hex chunk [i*w, (i+1)*w)
    val digest = md5Hex(shingle)
    var i = 0
    while (i < k) {
      val h = digest.substring(i * width, i * width + width)
      if (buf(i) == null || h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Array[String] = buf

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()

  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
