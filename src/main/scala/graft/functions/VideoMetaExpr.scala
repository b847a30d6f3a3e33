package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video metadata sniffing from container header bytes — completing the
  * image ([[ImageDims]]) / audio ([[AudioMeta]]) / video modality triad
  * with, again, no codec dependency: ISO BMFF (MP4/MOV) keeps the
  * presentation timescale and duration in the mandatory `moov/mvhd` box
  * and per-track display size in `moov/trak/tkhd`; AVI keeps
  * frame-period, frame count and frame size in the `avih` main header.
  * Duration filtering, aspect-ratio stratification, and hour-count
  * accounting over a 100 TB video corpus are pure header projections —
  * frames are never decoded.
  *
  * Returns struct(format, duration_ms, width, height); NULL for
  * unrecognized/truncated payloads. Width/height are 0 when the
  * container carries no visual track (e.g. an MP4 with audio only).
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${dt.simpleString}")
  }

  override def dataType: DataType = VideoMeta.OutType

  override def nullable: Boolean = true

  override def prettyName: String = "video_meta"

  override def nullSafeEval(input: Any): Any =
    VideoMeta.sniff(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VideoMeta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.sniff($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {

  val OutType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Column-API entry point: `videoMeta($"payload")`. */
  def apply(payload: Column): Column = Shim.column(VideoMeta(Shim.expression(payload)))

  // byte-order primitives shared via ByteReads (one definition, the
  // signedness in the name — see that object's scaladoc)
  private def u8(b: Array[Byte], i: Int): Int = ByteReads.u8(b, i)
  private def be16(b: Array[Byte], i: Int): Int = ByteReads.be16(b, i)
  private def be32(b: Array[Byte], i: Int): Long = ByteReads.be32u(b, i)
  private def be64(b: Array[Byte], i: Int): Long = ByteReads.be64(b, i)
  private def le32(b: Array[Byte], i: Int): Long = ByteReads.le32u(b, i)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean = ByteReads.tag(b, i, s)

  private def row(fmt: String, durMs: Long, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), durMs, w, h))

  /** Walk one level of ISO BMFF boxes inside [start, end), invoking `f`
    * with (type-offset, payload-start, payload-end) for each box.
    * Returns false on a malformed size (caller bails to null).
    */
  private def eachBox(b: Array[Byte], start: Long, end: Long)
                     (f: (Int, Int, Int) => Unit): Boolean = {
    var i = start
    while (i + 8 <= end) {
      val p = i.toInt
      var size: Long = be32(b, p)
      var hdr = 8L
      if (size == 1 && i + 16 <= end) { size = be64(b, p + 8); hdr = 16L }
      else if (size == 0) size = end - i // box runs to the end
      if (size < hdr || i + size > end) return false
      f(p + 4, (i + hdr).toInt, (i + size).toInt)
      i += size
    }
    true
  }

  /** Header sniff; null when no known signature matches or the needed
    * boxes/chunks are missing/truncated.
    */
  def sniff(b: Array[Byte]): InternalRow = {
    // ISO BMFF (MP4/MOV/M4V): an `ftyp` box first, then a top-level walk
    // to `moov`; inside it `mvhd` (timescale+duration) and each
    // `trak/tkhd` (display size, fixed-point 16.16). A malformed moov is
    // fatal (null); a malformed trak only loses that track's size.
    if (b.length >= 12 && tag(b, 4, "ftyp")) {
      var durMs = -1L
      var w = 0; var h = 0
      var bad = false
      val okTop = eachBox(b, 0, b.length) { (t, ps, pe) =>
        if (tag(b, t, "moov")) {
          val okMoov = eachBox(b, ps, pe) { (ct, cs, ce) =>
            if (tag(b, ct, "mvhd") && ce - cs >= 20) {
              val v = u8(b, cs)
              if (v == 0) {
                val timescale = be32(b, cs + 12)
                val dur = be32(b, cs + 16) // be32 is unsigned-masked
                if (timescale > 0) durMs = dur * 1000L / timescale
              } else if (v == 1 && ce - cs >= 32) {
                val timescale = be32(b, cs + 20)
                val dur = be64(b, cs + 24)
                // overflow guard, same posture as the AVI branch: a
                // crafted duration near 2^61 wraps dur*1000 to a
                // POSITIVE garbage value the durMs<0 backstop misses
                if (timescale > 0 && dur >= 0 && dur <= Long.MaxValue / 1000L)
                  durMs = dur * 1000L / timescale
              }
            } else if (tag(b, ct, "trak")) {
              eachBox(b, cs, ce) { (tt, ts, te) =>
                if (tag(b, tt, "tkhd") && w == 0 && te - ts >= 4) {
                  val v = u8(b, ts)
                  val base = if (v == 1) ts + 88 else ts + 76 // offset of width
                  if (base + 8 <= te) {
                    val tw = (be32(b, base) >> 16).toInt      // 16.16 fixed point
                    val th = (be32(b, base + 4) >> 16).toInt
                    if (tw > 0 && th > 0) { w = tw; h = th }
                  }
                }
              }
              ()
            }
          }
          if (!okMoov) bad = true
        }
      }
      if (!okTop || bad || durMs < 0) return null
      return row("mp4", durMs, w, h)
    }
    // AVI: RIFF....AVI , then LIST hdrl whose first child is avih:
    // dwMicroSecPerFrame, ..., dwTotalFrames (ofs +16), dwWidth (+32),
    // dwHeight (+36) — all little-endian.
    if (tag(b, 0, "RIFF") && tag(b, 8, "AVI ")) {
      var i = 12L
      while (i + 8 <= b.length) {
        val p = i.toInt
        val size = le32(b, p + 4)
        if (size > b.length) return null
        if (tag(b, p, "LIST") && tag(b, p + 8, "hdrl") && tag(b, p + 12, "avih")) {
          val a = p + 20 // avih payload (past its own 8-byte chunk header)
          if (a + 40 > b.length) return null
          val usPerFrame = le32(b, a)
          val frames = le32(b, a + 16)
          val w = le32(b, a + 32).toInt
          val h = le32(b, a + 36).toInt
          // both fields are unsigned 32-bit: the product can exceed
          // Long.MaxValue for adversarial headers — malformed → NULL,
          // never a negative duration
          if (usPerFrame != 0 && frames > Long.MaxValue / usPerFrame) return null
          return row("avi", usPerFrame * frames / 1000L, w, h)
        }
        i += 8 + size + (size & 1)
      }
      return null
    }
    null
  }
}
