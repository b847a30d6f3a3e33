package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Real header parsing against handcrafted, spec-conformant byte
  * sequences for each format — and the negative path.
  */
class ImageDimsSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrLen = Array(0, 0, 0, 13).map(_.toByte)
    val ihdrTag = "IHDR".getBytes
    val dims = Array(w >>> 24, w >>> 16, w >>> 8, w, h >>> 24, h >>> 16, h >>> 8, h)
      .map(v => (v & 0xff).toByte)
    sig ++ ihdrLen ++ ihdrTag ++ dims ++ Array.fill(5)(0.toByte)
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    // APP0 segment before the SOF, as real files have
    val app0 = Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte) ++ Array.fill(14)(0.toByte)
    val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 8,
      (h >>> 8) & 0xff, h & 0xff, (w >>> 8) & 0xff, w & 0xff, 3).map(_.toByte) ++
      Array.fill(9)(0.toByte)
    soi ++ app0 ++ sof0
  }

  private def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ Array(w & 0xff, w >>> 8, h & 0xff, h >>> 8).map(_.toByte)

  private def bmp(w: Int, h: Int): Array[Byte] =
    // 14-byte file header, then BITMAPINFOHEADER: DIB size 40 at offset
    // 14 (the sniffer DISPATCHES on this field — a zero there is not a
    // conformant BMP and sniffs to null)
    "BM".getBytes ++ Array.fill(12)(0.toByte) ++
      Array(40, 0, 0, 0).map(_.toByte) ++
      Array(w & 0xff, (w >>> 8) & 0xff, (w >>> 16) & 0xff, (w >>> 24) & 0xff,
        h & 0xff, (h >>> 8) & 0xff, (h >>> 16) & 0xff, (h >>> 24) & 0xff).map(_.toByte)

  private def bmpCore(w: Int, h: Int): Array[Byte] =
    // OS/2 BITMAPCOREHEADER: DIB size 12, le16 width/height at 18/20
    "BM".getBytes ++ Array.fill(12)(0.toByte) ++
      Array(12, 0, 0, 0).map(_.toByte) ++
      Array(w & 0xff, (w >>> 8) & 0xff, h & 0xff, (h >>> 8) & 0xff).map(_.toByte) ++
      Array.fill(4)(0.toByte)

  test("sniffs dimensions from PNG, JPEG, GIF, and BMP headers") {
    val rows = Seq(
      ("png", png(640, 480)), ("jpeg", jpeg(320, 240)),
      ("gif", gif(101, 53)), ("bmp", bmp(800, 600)))
    val got = rows.toDF("expected", "payload")
      .select($"expected", ImageDims($"payload").as("m"))
      .select($"expected", $"m.format", $"m.width", $"m.height")
      .as[(String, String, Int, Int)].collect()
      .map { case (k, f, w, h) => k -> ((f, w, h)) }.toMap
    assert(got("png") == ("png", 640, 480))
    assert(got("jpeg") == ("jpeg", 320, 240))
    assert(got("gif") == ("gif", 101, 53))
    assert(got("bmp") == ("bmp", 800, 600))
  }

  test("BMP core header (OS/2) and fill-padded JPEG parse; bad DIB size is null") {
    // 12-byte BITMAPCOREHEADER: 16-bit dims — the 40-byte parse would
    // fuse width|height into one garbage value
    val core = Seq(Tuple1(bmpCore(320, 200))).toDF("payload")
      .select(ImageDims($"payload").as("m")).select("m.*")
      .as[(String, Int, Int)].head()
    assert(core == ("bmp", 320, 200))
    // unknown DIB size: null, never garbage
    val bad = "BM".getBytes ++ Array.fill(12)(0.toByte) ++
      Array(7, 0, 0, 0).map(_.toByte) ++ Array.fill(12)(0.toByte)
    assert(Seq(Tuple1(bad)).toDF("payload")
      .select(ImageDims($"payload")).head().isNullAt(0))
    // JPEG B.1.1.2 fill bytes: extra 0xFF padding before a marker must
    // not desync the scan
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val fill = Array(0xff, 0xff, 0xff).map(_.toByte)
    val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 8, 0, 240, 1, 64, 3).map(_.toByte) ++
      Array.fill(9)(0.toByte)
    val padded = Seq(Tuple1(soi ++ fill ++ sof0)).toDF("payload")
      .select(ImageDims($"payload").as("m")).select("m.*")
      .as[(String, Int, Int)].head()
    assert(padded == ("jpeg", 320, 240), padded.toString)
  }

  test("unknown payloads sniff to null; SQL surface matches; plan is codegen") {
    GraftFunctions.register(spark)
    val df = Seq(("t1", "just text".getBytes), ("t2", Array[Byte]()))
      .toDF("id", "payload")
    assert(df.select(ImageDims($"payload")).filter($"image_dims(payload)".isNotNull)
      .count() == 0)
    df.createOrReplaceTempView("payloads")
    val viaSql = spark.sql(
      "SELECT id FROM payloads WHERE image_dims(payload) IS NULL ORDER BY id")
      .as[String].collect().toSeq
    assert(viaSql == Seq("t1", "t2"))
  }

  test("Multimodal.withImageMeta attaches the sniffed struct") {
    val df = Seq((1L, png(32, 16)), (2L, "not an image".getBytes))
      .toDF("id", "payload")
    val got = graft.ops.Multimodal.withImageMeta(df)
      .select($"id", $"image_meta.width")
      .as[(Long, Option[Int])].collect().toMap
    assert(got(1L).contains(32) && got(2L).isEmpty)
  }

  test("truncated and desynced headers return null, never throw") {
    val bad = Seq(
      png(9, 9).take(20),                       // PNG cut before IHDR data
      Array(0xff, 0xd8, 0x00, 0x00).map(_.toByte), // JPEG marker desync
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte), // EOI before SOF
      "GIF8".getBytes)                          // truncated GIF signature
    val n = bad.zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("id", "payload")
      .select(ImageDims($"payload").as("m")).filter($"m".isNotNull).count()
    assert(n == 0)
  }
}
