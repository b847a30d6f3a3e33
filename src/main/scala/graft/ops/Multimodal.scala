package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batched executor-side passes.
  *
  * The Spark-side contract is real and tested — schema, partition-local
  * batched execution (`mapPartitions`, the Scala analog of `mapInPandas`),
  * deterministic output shape. IMAGE decode is REAL ([[decodeImage]]:
  * the JDK's bundled javax.imageio codecs — PNG/JPEG/GIF/BMP — pixel
  * dimensions + grid-luma features); audio/video decode stays STUBBED
  * (`decodeStub` — those codecs are not in the JDK): a deterministic
  * fake feature vector from the payload bytes. Swapping in a real
  * audio/video decoder changes only the function body, not the plumbing.
  *
  * Scale posture: payloads stay on executors end to end (no collect); the
  * decode pass is partition-local with zero shuffle; feature vectors are
  * fixed-size `array<float>` ready for [[Similarity]] ANN; metadata-only
  * queries (byte_len, digest) never deserialize the payload column thanks
  * to parquet column pruning.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("sha256", StringType, nullable = false),
    StructField("modality", StringType, nullable = false)))

  /** Attach a binary payload + metadata struct to a documents-like frame
    * (text re-encoded as utf-8 bytes stands in for real media bytes).
    * Pure projection: encode/sha2/octet_length are codegen'd.
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        octet_length(col(textCol)).cast(LongType).as("byte_len"),
        sha2(col(textCol).cast(BinaryType), 256).as("sha256"),
        lit("text").as("modality")))

  /** REAL image metadata from header bytes (no codec): attach
    * struct(format, width, height) sniffed from PNG/JPEG/GIF/BMP headers
    * ([[graft.functions.ImageDims]], a codegen'd expression) — null for
    * unrecognized payloads. At 100 TB this reads a few hundred bytes per
    * row and never decodes pixels; aspect/size filtering and dims+digest
    * dedup run on it directly.
    */
  def withImageMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("image_meta", graft.functions.ImageDims(col(payloadCol)))

  /** REAL audio metadata from container headers (WAV fmt/data chunks,
    * FLAC STREAMINFO — [[graft.functions.AudioMeta]]): channels, sample
    * rate, bit depth, derived duration. Length filtering and hour-count
    * accounting over an audio corpus without decoding a sample.
    */
  def withAudioMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("audio_meta", graft.functions.AudioMeta(col(payloadCol)))

  /** REAL video metadata from container headers (ISO BMFF moov/mvhd +
    * trak/tkhd, AVI avih — [[graft.functions.VideoMeta]]): duration and
    * display size. Duration filtering and hour-count accounting over a
    * video corpus without decoding a frame.
    */
  def withVideoMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("video_meta", graft.functions.VideoMeta(col(payloadCol)))

  val FeatureDim = 16

  /** REAL image decode via the JDK's bundled codecs (javax.imageio ships
    * PNG/JPEG/GIF/BMP readers — no external libraries): actual pixel
    * dimensions plus a [[FeatureDim]]-long feature vector = mean luma
    * (Rec.601) over a 4x4 spatial grid, each cell in [0, 1] — the
    * standard cheap perceptual signature for dedup blocking and
    * brightness/blank-image filtering.
    *
    * Pixel cost is capped: the luma pass stride-samples at most 64x64
    * pixel positions regardless of image size, so a 100-megapixel photo
    * costs the same scan as a thumbnail (decode itself is codec-bound).
    * Returns None when ImageIO has no reader for the bytes (non-image
    * modality or corrupt payload) — callers fall back to the stub.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val grid = 4 // FeatureDim = grid * grid
        val sums = new Array[Double](grid * grid)
        val counts = new Array[Long](grid * grid)
        val stepY = math.max(1, h / 64)
        val stepX = math.max(1, w / 64)
        var y = 0
        while (y < h) {
          val gy = math.min(grid - 1, y * grid / h)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            val cell = gy * grid + math.min(grid - 1, x * grid / w)
            sums(cell) += luma
            counts(cell) += 1
            x += stepX
          }
          y += stepY
        }
        val feats = Array.tabulate(FeatureDim) { i =>
          if (counts(i) == 0) 0.0f else (sums(i) / counts(i) / 255.0).toFloat
        }
        Some((w, h, feats))
      }
    } catch { case _: Throwable => None }

  /** STUB decoder: stands in for audio/video decode + feature extraction
    * (those codecs are not in the JDK). Deterministic fake: feature i =
    * byte at stride i scaled to [0, 1); "width"/"height" derived from the
    * byte length. The signature and batch shape are the real contract.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val width = math.max(1, n % 640)
    val height = math.max(1, (n * 7) % 480)
    val feats = Array.tabulate(FeatureDim) { i =>
      if (n == 0) 0.0f
      else (payload((i.toLong * n / FeatureDim).toInt % n) & 0xFF) / 256.0f
    }
    (width, height, feats)
  }

  /** Partition-local batched decode pass: payload → (width, height,
    * features). Image payloads take the REAL [[decodeImage]] path (JDK
    * ImageIO: PNG/JPEG/GIF/BMP); everything else falls back to
    * [[decodeStub]]. Runs once per row inside `mapPartitions` so
    * per-partition decoder state (ImageIO reader cache) is initialized
    * once per task, exactly like `mapInPandas` batches.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("width", IntegerType).add("height", IntegerType)
      .add("features", ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // ImageIO scans for plugin readers on first use; disk-cache off
      // keeps the per-task decode purely in-memory
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val (w, h, f) = decodeImage(payload).getOrElse(decodeStub(payload))
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(enc)
  }

  /** STUB resize: stands in for image resize/transcode. Deterministic
    * fake: stride-samples the payload down to ~`targetBytes` (keeps the
    * first byte, then every ceil(n/targetBytes)-th). The real contract is
    * the shape: payload in → smaller payload out, partition-local.
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    val n = payload.length
    if (n <= targetBytes) payload
    else {
      val stride = math.ceil(n.toDouble / targetBytes).toInt
      val out = new Array[Byte]((n + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = payload(i * stride); i += 1 }
      out
    }
  }

  /** Partition-local batched resize pass: rewrites the payload column in
    * place (same schema out), decoder/encoder state initialized once per
    * task — the write-side twin of [[decodeFeatures]].
    */
  def resizePayloads(df: DataFrame, targetBytes: Int,
                     payloadCol: String = "payload"): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(df.schema)
    df.mapPartitions { rows =>
      // real transcoder: initialize codec context here, once per partition
      rows.map { r =>
        val resized = resizeStub(r.getAs[Array[Byte]](idx), targetBytes)
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }(enc)
  }

  /** REAL image resize via the JDK alone: ImageIO decode (PNG/JPEG/GIF/
    * BMP), bilinear Graphics2D scale of the longest side down to
    * `maxDim` (aspect preserved, never upscales), PNG re-encode.
    * None when the payload has no ImageIO reader — callers fall back to
    * the byte-stride stub (audio/video modalities).
    */
  def resizeImage(payload: Array[Byte], maxDim: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else if (math.max(img.getWidth, img.getHeight) <= maxDim) Some(payload)
      else {
        val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
        val nw = math.max(1, math.round(img.getWidth * scale).toInt)
        val nh = math.max(1, math.round(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Throwable => None }

  /** Partition-local REAL image-resize pass: decodable image payloads are
    * scaled to fit `maxDim` and re-encoded ([[resizeImage]]); payloads
    * ImageIO can't read fall back to the byte-stride stub with a
    * `maxDim*maxDim` byte budget. Headless AWT runs fine in executors —
    * no display, no native codecs needed.
    */
  def resizeImages(df: DataFrame, maxDim: Int,
                   payloadCol: String = "payload"): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(df.schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val p = r.getAs[Array[Byte]](idx)
        val resized = resizeImage(p, maxDim).getOrElse(resizeStub(p, maxDim * maxDim))
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }(enc)
  }

  /** Frame sampling stub for video-like payloads: pick `n` deterministic
    * byte offsets (frame anchors) per payload; one output row per frame —
    * a generator (explode) over a computed offsets array, no UDF.
    */
  def sampleFrames(df: DataFrame, n: Int, payloadCol: String = "payload"): DataFrame =
    df
      .withColumn("__len", octet_length(col(payloadCol)).cast(LongType))
      .withColumn("frame_no", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset", floor(col("frame_no") * col("__len") / n))
      .drop("__len")
}
