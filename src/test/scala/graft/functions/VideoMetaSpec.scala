package graft.functions

import graft.SparkSpec

/** Header parsing against spec-conformant handcrafted ISO BMFF (MP4) and
  * AVI byte sequences, plus the negative/truncated paths.
  */
class VideoMetaSpec extends SparkSpec {
  import spark.implicits._

  private def be16(v: Int) = Array((v >>> 8) & 0xff, v & 0xff).map(_.toByte)
  private def be32(v: Long) = Array((v >>> 24) & 0xff, (v >>> 16) & 0xff,
    (v >>> 8) & 0xff, v & 0xff).map(x => (x & 0xff).toByte)
  private def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def le32(v: Long) = Array(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff,
    (v >>> 24) & 0xff).map(x => (x & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes ++ payload

  /** mvhd v0: ver/flags, ctime, mtime, timescale, duration. */
  private def mvhd0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration))

  /** mvhd v1: 64-bit times/duration. */
  private def mvhd1(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(timescale) ++ be64(duration))

  /** tkhd v0 with 16.16 fixed-point display size at payload offset 76. */
  private def tkhd0(w: Int, h: Int): Array[Byte] =
    box("tkhd", new Array[Byte](76) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private def mp4(mvhd: Array[Byte], traks: Array[Byte]*): Array[Byte] =
    box("ftyp", "isom".getBytes ++ be32(0) ++ "isomiso2".getBytes) ++
      box("moov", mvhd ++ traks.flatten.toArray)

  /** Minimal RIFF AVI with a LIST hdrl whose first child is avih. */
  private def avi(usPerFrame: Long, frames: Long, w: Int, h: Int): Array[Byte] = {
    val avih = "avih".getBytes ++ le32(56) ++
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16)
    val hdrl = "LIST".getBytes ++ le32(4L + avih.length) ++ "hdrl".getBytes ++ avih
    "RIFF".getBytes ++ le32(4L + hdrl.length) ++ "AVI ".getBytes ++ hdrl
  }

  test("MP4: duration from mvhd v0, size from the video trak's tkhd") {
    // timescale 600, duration 9000 → 15000 ms; 640x360 video track after
    // an audio track with zero display size (must be skipped).
    val payload = mp4(mvhd0(600, 9000), box("trak", tkhd0(0, 0)),
      box("trak", tkhd0(640, 360)))
    val got = Seq(Tuple1(payload)).toDF("payload")
      .select(VideoMeta($"payload").as("m")).select("m.*")
      .as[(String, Long, Int, Int)].head()
    assert(got == ("mp4", 15000L, 640, 360))
  }

  test("MP4: 64-bit mvhd v1 duration") {
    val payload = mp4(mvhd1(90000, 5400000L)) // 60 s at 90 kHz, no video trak
    val got = Seq(Tuple1(payload)).toDF("payload")
      .select(VideoMeta($"payload").as("m")).select("m.*")
      .as[(String, Long, Int, Int)].head()
    assert(got == ("mp4", 60000L, 0, 0))
  }

  test("AVI: duration from avih frame period × frame count, size from avih") {
    val payload = avi(usPerFrame = 40000, frames = 250, w = 1280, h = 720) // 10 s @ 25fps
    val got = Seq(Tuple1(payload)).toDF("payload")
      .select(VideoMeta($"payload").as("m")).select("m.*")
      .as[(String, Long, Int, Int)].head()
    assert(got == ("avi", 10000L, 1280, 720))
  }

  test("SQL surface and negatives: unknown/truncated payloads are null") {
    GraftFunctions.register(spark)
    Seq(
      ("mp4_ok", mp4(mvhd0(1000, 2500), box("trak", tkhd0(320, 240)))),
      ("not_video", "plain bytes".getBytes),
      ("ftyp_cut", be32(100) ++ "ftyp".getBytes),       // declared size > buffer
      ("no_moov", box("ftyp", "isom".getBytes)),
      ("avi_cut", "RIFF".getBytes ++ le32(4) ++ "AVI ".getBytes))
      .toDF("id", "payload").createOrReplaceTempView("video_v")
    val got = spark.sql(
      "SELECT id, video_meta(payload).duration_ms AS d FROM video_v ORDER BY id")
      .as[(String, Option[Long])].collect().toMap
    assert(got("mp4_ok").contains(2500L))
    assert(got("not_video").isEmpty && got("ftyp_cut").isEmpty &&
      got("no_moov").isEmpty && got("avi_cut").isEmpty)
  }
}
