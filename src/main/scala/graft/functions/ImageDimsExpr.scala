package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Image dimension sniffing from raw payload bytes — REAL multimodal
  * metadata extraction with no codec dependency: PNG / JPEG / GIF / BMP
  * dimensions live in fixed header fields (PNG IHDR big-endian at offset
  * 16/20; JPEG SOF segment scan; GIF logical screen little-endian at
  * 6/8; BMP DIB header little-endian at 18/22), so width/height of a
  * 100 TB image corpus is a pure projection that reads a few hundred
  * header bytes per row — the full payload is never decoded, and
  * metadata-only pipelines (size histograms, aspect filtering, dedup by
  * dims+digest) need no image library at all.
  *
  * Returns struct(format, width, height); NULL for payloads that match
  * no known signature (callers filter or route to the decode path).
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ImageDims.OutType

  override def nullable: Boolean = true

  override def prettyName: String = "image_dims"

  override def nullSafeEval(input: Any): Any =
    ImageDims.sniff(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageDims.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.sniff($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object ImageDims {

  val OutType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Column-API entry point: `imageDims($"payload")`. */
  def apply(payload: Column): Column = Shim.column(ImageDims(Shim.expression(payload)))

  // byte-order primitives shared via ByteReads; this sniffer uses the
  // SIGNED 32-bit forms (BMP biHeight is two's-complement — negative
  // marks top-down row order)
  private def u8(b: Array[Byte], i: Int): Int = ByteReads.u8(b, i)
  private def be16(b: Array[Byte], i: Int): Int = ByteReads.be16(b, i)
  private def le16(b: Array[Byte], i: Int): Int = ByteReads.le16(b, i)
  private def be32(b: Array[Byte], i: Int): Int = ByteReads.be32s(b, i)
  private def le32(b: Array[Byte], i: Int): Int = ByteReads.le32s(b, i)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** Header sniff; null when no known signature matches. */
  def sniff(b: Array[Byte]): InternalRow = {
    // PNG: 8-byte signature, then IHDR chunk (len+type at 8..15, data at 16)
    if (b.length >= 24 &&
      u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a)
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a / GIF89a: logical screen size, little-endian
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // BMP: "BM", then the DIB header SIZE at offset 14 picks the layout —
    // 40+ (BITMAPINFO/V4/V5: le32 width/height at 18/22, height may be
    // negative for top-down rows) or 12 (OS/2 BITMAPCOREHEADER: le16 at
    // 18/20). Reading 32-bit fields from a CORE header would fuse
    // width|height into one garbage value; unknown sizes return null.
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dib = le32(b, 14)
      if (dib >= 40) return row("bmp", le32(b, 18), math.abs(le32(b, 22)))
      if (dib == 12) return row("bmp", le16(b, 18), le16(b, 20))
      return null
    }
    // JPEG: SOI then marker segments; dimensions are in the first SOF
    // (C0-C3, C5-C7, C9-CB, CD-CF) segment: [len][prec][height][width]
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 9 <= b.length) {
        if (u8(b, i) != 0xff) return null // marker desync — not a JPEG
        // JPEG B.1.1.2: any number of 0xFF FILL bytes may precede a
        // marker — skip them, or the next byte pair reads FF FF as a
        // marker with a bogus length and the scan desyncs on spec-valid
        // files from padding-emitting encoders
        while (i + 9 <= b.length && u8(b, i + 1) == 0xff) i += 1
        if (i + 9 > b.length) return null
        val m = u8(b, i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i += 2 // standalone markers carry no length
        } else if (m == 0xda || m == 0xd9) {
          return null // scan data / EOI before any SOF
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return null
          val sof = (m >= 0xc0 && m <= 0xc3) || (m >= 0xc5 && m <= 0xc7) ||
            (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf)
          if (sof) {
            if (i + 9 > b.length) return null
            return row("jpeg", be16(b, i + 7), be16(b, i + 5))
          }
          i += 2 + len
        }
      }
      return null
    }
    null
  }
}
