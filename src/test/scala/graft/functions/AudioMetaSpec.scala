package graft.functions

import graft.SparkSpec

/** Header parsing against spec-conformant handcrafted WAV and FLAC
  * byte sequences, plus the negative/truncated paths.
  */
class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical 44-byte WAV header + data chunk declaration. */
  private def wav(ch: Int, rate: Int, bits: Int, dataBytes: Int): Array[Byte] = {
    def le16(v: Int) = Array(v & 0xff, (v >>> 8) & 0xff).map(_.toByte)
    def le32(v: Int) = Array(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff,
      (v >>> 24) & 0xff).map(_.toByte)
    val byteRate = rate * ch * bits / 8
    "RIFF".getBytes ++ le32(36 + dataBytes) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(byteRate) ++ le16(ch * bits / 8) ++ le16(bits) ++
      "data".getBytes ++ le32(dataBytes) ++ Array.fill(dataBytes)(0.toByte)
  }

  /** fLaC marker + STREAMINFO block with rate/channels/bits/samples. */
  private def flac(ch: Int, rate: Int, bits: Int, samples: Long): Array[Byte] = {
    val block = new Array[Byte](34)
    // rate: 20 bits across block bytes 10..12 high nibble
    block(10) = ((rate >>> 12) & 0xff).toByte
    block(11) = ((rate >>> 4) & 0xff).toByte
    block(12) = ((((rate & 0xf) << 4) | (((ch - 1) & 0x7) << 1) |
      (((bits - 1) >>> 4) & 0x1)) & 0xff).toByte
    block(13) = (((((bits - 1) & 0xf) << 4) | ((samples >>> 32) & 0xf)) & 0xff).toByte
    block(14) = ((samples >>> 24) & 0xff).toByte
    block(15) = ((samples >>> 16) & 0xff).toByte
    block(16) = ((samples >>> 8) & 0xff).toByte
    block(17) = (samples & 0xff).toByte
    "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ block
  }

  test("WAV: channels/rate/bits from fmt, duration from data size") {
    // 2ch 16-bit 44100 Hz, 1 second of frames
    val payload = wav(2, 44100, 16, 44100 * 4)
    val got = Seq(Tuple1(payload)).toDF("payload")
      .select(AudioMeta($"payload").as("m")).select("m.*")
      .as[(String, Int, Int, Int, Long)].head()
    assert(got == ("wav", 2, 44100, 16, 1000L))
  }

  test("compressed WAV (non-PCM format tag) sniffs to null, not a wrong duration") {
    // IMA-ADPCM: format tag 0x11, bits=4 — dataBytes/(ch*bits/8) would
    // report ~4x the real duration; the sniffer must decline instead
    def le16(v: Int) = Array(v & 0xff, (v >>> 8) & 0xff).map(_.toByte)
    def le32(v: Int) = Array(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff,
      (v >>> 24) & 0xff).map(_.toByte)
    val adpcm = "RIFF".getBytes ++ le32(36 + 1000) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(0x11) ++ le16(2) ++ le32(8000) ++
      le32(8000) ++ le16(1) ++ le16(4) ++
      "data".getBytes ++ le32(1000) ++ Array.fill(1000)(0.toByte)
    assert(Seq(Tuple1(adpcm)).toDF("payload")
      .select(AudioMeta($"payload")).head().isNullAt(0))
  }

  test("FLAC: STREAMINFO rate/channels/bits/samples") {
    val payload = flac(1, 16000, 16, 48000L) // 3 seconds mono
    val got = Seq(Tuple1(payload)).toDF("payload")
      .select(AudioMeta($"payload").as("m")).select("m.*")
      .as[(String, Int, Int, Int, Long)].head()
    assert(got == ("flac", 1, 16000, 16, 3000L))
  }

  test("SQL surface and negatives: unknown/truncated payloads are null") {
    GraftFunctions.register(spark)
    Seq(
      ("wav_ok", wav(1, 8000, 8, 8000)),
      ("not_audio", "plain bytes".getBytes),
      ("riff_cut", "RIFFxxxx".getBytes),
      ("flac_cut", "fLaC".getBytes ++ Array[Byte](0, 0, 0)))
      .toDF("id", "payload").createOrReplaceTempView("audio_v")
    val got = spark.sql(
      "SELECT id, audio_meta(payload).duration_ms AS d FROM audio_v ORDER BY id")
      .as[(String, Option[Long])].collect().toMap
    assert(got("wav_ok").contains(1000L))
    assert(got("not_audio").isEmpty && got("riff_cut").isEmpty && got("flac_cut").isEmpty)
  }
}
