package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio metadata sniffing from container header bytes — the audio twin
  * of [[ImageDims]], again with no codec dependency: WAV keeps channel
  * count / sample rate / bits-per-sample in the RIFF `fmt ` chunk and
  * sample count in the `data` chunk size; FLAC keeps all of it in the
  * mandatory STREAMINFO block right after the `fLaC` marker. Duration
  * is derived (samples / rate), so length filtering, per-rate
  * stratification, and hour-count accounting over a 100 TB audio corpus
  * are pure header projections — samples are never decoded.
  *
  * Returns struct(format, channels, sample_rate, bits_per_sample,
  * duration_ms); NULL for unrecognized/truncated payloads.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${dt.simpleString}")
  }

  override def dataType: DataType = AudioMeta.OutType

  override def nullable: Boolean = true

  override def prettyName: String = "audio_meta"

  override def nullSafeEval(input: Any): Any =
    AudioMeta.sniff(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AudioMeta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.sniff($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {

  val OutType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Column-API entry point: `audioMeta($"payload")`. */
  def apply(payload: Column): Column = Shim.column(AudioMeta(Shim.expression(payload)))

  // byte-order primitives shared via ByteReads (one definition, the
  // signedness in the name — see that object's scaladoc)
  private def u8(b: Array[Byte], i: Int): Int = ByteReads.u8(b, i)
  private def le16(b: Array[Byte], i: Int): Int = ByteReads.le16(b, i)
  private def le32(b: Array[Byte], i: Int): Long = ByteReads.le32u(b, i)
  private def be24(b: Array[Byte], i: Int): Int = ByteReads.be24(b, i)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean = ByteReads.tag(b, i, s)

  private def row(fmt: String, ch: Int, rate: Int, bits: Int, durMs: Long): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), ch, rate, bits, durMs))

  /** Header sniff; null when no known signature matches or the needed
    * chunks are missing/truncated.
    */
  def sniff(b: Array[Byte]): InternalRow = {
    // WAV: RIFF....WAVE, then chunk walk for "fmt " and "data"
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) {
      var i = 12L
      var ch = -1; var rate = -1; var bits = -1; var dataBytes = -1L
      var fmtTag = -1
      while (i + 8 <= b.length && (ch < 0 || dataBytes < 0)) {
        val p = i.toInt
        val size = le32(b, p + 4)
        if (size > b.length) return null // chunk larger than the buffer: malformed
        if (tag(b, p, "fmt ") && p + 24 <= b.length) {
          fmtTag = le16(b, p + 8)
          ch = le16(b, p + 10)
          rate = le32(b, p + 12).toInt
          bits = le16(b, p + 22)
        } else if (tag(b, p, "data")) {
          dataBytes = size
        }
        i += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (ch <= 0 || rate <= 0 || bits <= 0 || dataBytes < 0) return null
      // duration = dataBytes / (ch*bits/8) holds ONLY for uncompressed
      // frames: PCM (1), IEEE float (3), a-law/mu-law (6/7, bits=8) and
      // the extensible wrapper (0xFFFE). A compressed payload (ADPCM
      // 0x11 at bits=4, MP3-in-WAV 0x55) would yield a confidently
      // wrong duration — return null rather than 4x-off hour counts.
      if (fmtTag != 1 && fmtTag != 3 && fmtTag != 6 && fmtTag != 7 &&
          fmtTag != 0xFFFE) return null
      val bytesPerFrame = ch.toLong * bits / 8
      if (bytesPerFrame <= 0) return null
      val frames = dataBytes / bytesPerFrame
      return row("wav", ch, rate, bits, frames * 1000L / rate)
    }
    // FLAC: fLaC marker, then STREAMINFO (block type 0, 34 bytes):
    // bytes 10..12 of the block hold rate(20b)/channels(3b)/bits(5b) and
    // the top of the 36-bit total-sample count
    if (tag(b, 0, "fLaC") && b.length >= 42 && (u8(b, 4) & 0x7f) == 0) {
      val off = 8 // block header (4) past the marker (4)
      val rate = (be24(b, off + 10) >>> 4) & 0xfffff
      val ch = ((u8(b, off + 12) >>> 1) & 0x7) + 1
      val bits = (((u8(b, off + 12) & 0x1) << 4) | (u8(b, off + 13) >>> 4)) + 1
      val samples = ((u8(b, off + 13) & 0xf).toLong << 32) |
        (((u8(b, off + 14).toLong << 24) | (u8(b, off + 15) << 16) |
          (u8(b, off + 16) << 8) | u8(b, off + 17)) & 0xffffffffL)
      if (rate <= 0) return null
      return row("flac", ch, rate, bits, samples * 1000L / rate)
    }
    null
  }
}
