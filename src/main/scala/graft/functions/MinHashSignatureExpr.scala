package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over a text column: split on ' ', form word
  * n-gram shingles, md5 each shingle ONCE, and keep the k running minima
  * of the digest's disjoint hex chunks — all in one fused per-row pass.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.9 tier b): the
  * composable formulation (`transform` + `aggregate` + `zip_with` in
  * graft.ops.Dedup.minhashSignatureNarrow) runs on Spark's interpreted
  * higher-order-function path — per-shingle closure dispatch and
  * intermediate array allocation dominate, not the hashing. This
  * expression builds no shingle strings at all: each word is UTF-8
  * encoded once per document and the digest is fed word bytes plus a
  * separator, so per-shingle cost is one md5 update/digest cycle plus k
  * chunk comparisons on a reused buffer.
  *
  * Output values are IDENTICAL to the composable form and to the DuckDB
  * oracle (`min(substr(md5(shingle), i*w+1, w))` over distinct shingles,
  * w = Dedup.sigWidth(k)): md5 of the UTF-8 shingle bytes, lowercase hex,
  * lexicographic chunk minima — min is duplicate-invariant so multiset
  * vs set makes no difference. Documents with fewer than n words yield
  * NULL (the exploded/groupBy form simply has no row).
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1, s"need n >= 1; got n=$n")
  // chunked-md5 scheme: k disjoint sigWidth(k)-digit chunks of one
  // 32-hex-char digest — only k <= 8 fits (larger k would read past the
  // digest and corrupt signatures silently)
  graft.ops.Dedup.requireChunkableK(k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $cls.signature($c, $n, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** Column-API entry point: `minhashSig($"text", n = 3, k = 6)`. */
  def apply(text: Column, n: Int, k: Int): Column =
    Shim.column(MinHashSignature(Shim.expression(text), n, k))

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val SpaceByte = ' '.toByte
  private val HexChars = "0123456789abcdef".toCharArray

  /** One-pass signature; null when the document has fewer than n words.
    * Split semantics match `split(text, " ")` with limit -1 (empty words
    * kept, including leading/trailing), so values agree with the
    * composable pipeline and DuckDB `string_split(text, ' ')`.
    */
  def signature(text: UTF8String, n: Int, k: Int): GenericArrayData = {
    // split to word byte slices without building Strings — the boundary
    // scan is Shingles.wordStarts, the ONE definition all kernels share
    val bytes = text.getBytes
    val (starts, words) = Shingles.wordStarts(bytes)
    val m = words - n + 1
    if (m <= 0) return null

    val w = graft.ops.Dedup.sigWidth(k)
    val md = mdLocal.get()
    val mins = new Array[Array[Char]](k)
    val hex = new Array[Char](32)
    var i = 0
    while (i < m) {
      md.reset()
      // shingle = words[i..i+n) joined by ' ' — feed the digest the
      // original byte range directly (it already contains the separators)
      md.update(bytes, starts(i), starts(i + n) - 1 - starts(i))
      val digest = md.digest()
      var b = 0
      while (b < 16) {
        hex(b * 2) = HexChars((digest(b) >> 4) & 0xf)
        hex(b * 2 + 1) = HexChars(digest(b) & 0xf)
        b += 1
      }
      var c = 0
      while (c < k) {
        val off = c * w
        val cur = mins(c)
        if (cur == null) {
          mins(c) = java.util.Arrays.copyOfRange(hex, off, off + w)
        } else {
          // lexicographic compare of hex[off, off+w) vs cur
          var j = 0
          var cmp = 0
          while (j < w && cmp == 0) { cmp = hex(off + j) - cur(j); j += 1 }
          if (cmp < 0) {
            var j2 = 0
            while (j2 < w) { cur(j2) = hex(off + j2); j2 += 1 }
          }
        }
        c += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var c = 0
    while (c < k) { out(c) = UTF8String.fromString(new String(mins(c))); c += 1 }
    new GenericArrayData(out)
  }
}
