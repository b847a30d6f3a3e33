package graft.functions

/** The ONE set of byte-order primitives shared by the media header
  * sniffers ([[ImageDims]], [[AudioMeta]], [[VideoMeta]]). They were
  * private triplicates with DIFFERENT signedness per file (le32 as
  * signed Int in the image sniffer — BMP top-down heights rely on the
  * sign — but unsigned-masked Long in the audio/video ones); one
  * definition with the signedness IN THE NAME removes both the
  * duplication and the move-code-between-sniffers sign trap.
  */
private[functions] object ByteReads {
  def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  def be24(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 16) | (u8(b, i + 1) << 8) | u8(b, i + 2)

  /** SIGNED 32-bit reads: the format field is two's-complement
    * (e.g. BMP biHeight, negative for top-down rows).
    */
  def be32s(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  def le32s(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** UNSIGNED 32-bit reads as Long: sizes/counts/timescales that can
    * legitimately exceed Int.MaxValue.
    */
  def be32u(b: Array[Byte], i: Int): Long = be32s(b, i) & 0xffffffffL
  def le32u(b: Array[Byte], i: Int): Long = le32s(b, i) & 0xffffffffL

  def be64(b: Array[Byte], i: Int): Long =
    (be32u(b, i) << 32) | be32u(b, i + 4)

  /** 4-char ASCII tag match at offset `i` (bounds-checked). */
  def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      (0 until s.length).forall(j => b(i + j) == s.charAt(j).toByte)
}
