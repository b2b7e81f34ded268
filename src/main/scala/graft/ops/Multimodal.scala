package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample run as partition-parallel transforms over those
  * blobs.
  *
  * All three modalities decode REAL bytes with JDK codecs:
  *  - IMAGE: `javax.imageio.ImageIO` (PNG, JPEG, GIF, BMP) → width/height
  *    + first-band luminance statistics; the synthetic corpus carries
  *    genuine PNG bytes with deterministic pixels.
  *  - AUDIO: `javax.sound.sampled.AudioSystem` (WAV/PCM) → sample-rate /
  *    channels / amplitude statistics; the corpus carries genuine 16-bit
  *    PCM WAV bytes with deterministic samples.
  *  - VIDEO: multi-frame animated GIF via `ImageIO`'s sequence reader —
  *    frame count, dimensions, and FRAME-SAMPLED luminance statistics
  *    (decode every k-th frame, the cheap-scan shape a production ffmpeg
  *    kernel drops into for MP4); the corpus carries genuine animated-GIF
  *    bytes with deterministic per-frame pixels. `decodeStub` remains only
  *    as the documented fallback for container formats with no JDK codec.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      blob: Array[Byte],
      width: Int,
      height: Int)

  /** A sampled video frame with explicit lineage: `parent_id` is the source
    * video's media_id and `frame_idx` its 0-based frame number. Lineage as
    * separate columns (not an arithmetic id-packing scheme) cannot collide
    * with pre-existing media ids in a mixed corpus and has no overflow cap.
    */
  final case class FrameRow(
      parent_id: Long,
      frame_idx: Int,
      kind: String,
      blob: Array[Byte],
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      checksum: Long,
      feature: Seq[Double])

  /** Deterministic grayscale pixel value for synthetic images — shared by
    * the encoder and the decoded-equals-synthesized test oracle.
    */
  def pixelValue(id: Long, x: Int, y: Int): Int =
    (((id * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt

  /** A real PNG with deterministic pixels (TYPE_BYTE_GRAY, pixelValue). */
  def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixelValue(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a deterministic media table from any (id, text) table:
    * image rows carry REAL PNG bytes (deterministic pixels), audio rows
    * REAL 16-bit PCM WAV bytes (deterministic samples), video rows REAL
    * animated-GIF bytes (deterministic per-frame pixels). The width/height
    * columns are the crawler-declared metadata (same formula for every
    * kind — the `q_media_meta` oracle's contract); decode recovers the
    * true shape from the bytes. Stands in for crawled media in tests and
    * benchmarks.
    */
  def synthesizeMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    // the encoders below are the expensive kernel (ImageIO PNG / animated
    // GIF, AudioSystem WAV — milliseconds per row); a narrow input must not
    // serialize them on one core (Par.spread is a no-op at scale)
    Par.spread(df.select(col(idCol).cast("long").as("id"), col(textCol).as("t")))
      .as[(Long, String)]
      .map { case (id, t) =>
        // floorMod: Scala's % is dividend-signed, so a negative id would
        // produce a negative width/frame count and crash the encoders
        val w = 16 + math.floorMod(id, 64L).toInt
        val h = 16 + math.floorMod(id, 48L).toInt
        val m3 = math.floorMod(id, 3L)
        val kind = if (m3 == 0) "image" else if (m3 == 1) "audio" else "video"
        val blob =
          if (kind == "image") encodePng(id, w, h)
          else if (kind == "audio") encodeWav(id, wavFrames(id))
          else encodeGifAnim(id, w, h, videoFrames(id))
        MediaRow(id, kind, blob, w, h)
      }
  }

  /** Deterministic 16-bit PCM sample for synthetic audio — shared by the
    * encoder and the decoded-equals-synthesized test oracle.
    */
  def sampleValue(id: Long, i: Int): Short =
    ((((id * 2654435761L + i * 40503L) % 65536L) + 65536L) % 65536L - 32768L).toShort

  /** Nominal sample rate for synthetic WAV blobs (Hz). */
  val WavSampleRate = 8000

  /** Frame count for a synthetic audio blob. */
  def wavFrames(id: Long): Int = 64 + math.floorMod(id, 128L).toInt

  /** A real RIFF/WAVE blob: 16-bit PCM mono at [[WavSampleRate]] with
    * deterministic samples ([[sampleValue]]), written through the JDK's
    * `AudioSystem` encoder.
    */
  def encodeWav(id: Long, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      WavSampleRate.toFloat, 16, 1, true /* signed */, false /* little-endian */)
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = sampleValue(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: AudioSystem (JDK — WAV/PCM and whatever else the
    * installed providers read) → (sample_rate, channels, [n_frames, mean,
    * min, max]). n_frames counts FRAMES (sample sets across channels =
    * samples/channels); the amplitude stats run over every individual
    * sample of every channel. None on undecodable bytes — never throws.
    */
  def decodeAudio(blob: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2 // individual 16-bit samples, all channels
          var sum = 0.0
          var mn = Double.MaxValue
          var mx = Double.MinValue
          var i = 0
          val bigEndian = fmt.isBigEndian
          while (i < n) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1) & 0xff
            val v = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toDouble
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          val channels = math.max(1, fmt.getChannels)
          val frames = n / channels
          Some((fmt.getSampleRate.toInt, fmt.getChannels,
            Array(frames.toDouble, sum / math.max(1, n), if (n == 0) 0.0 else mn,
              if (n == 0) 0.0 else mx)))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Deterministic grayscale pixel for frame `f` of a synthetic video. */
  def framePixel(id: Long, f: Int, x: Int, y: Int): Int =
    pixelValue(id * 131L + f, x, y)

  /** Frame count for a synthetic video blob. */
  def videoFrames(id: Long): Int = 4 + math.floorMod(id, 6L).toInt

  /** A real animated GIF: `frames` grayscale frames of deterministic
    * pixels ([[framePixel]]), written through ImageIO's GIF sequence
    * writer. GIF is lossless at ≤256 colors, so an 8-bit gray raster
    * round-trips exactly.
    */
  def encodeGifAnim(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    // explicit 256-entry gray palette: the GIF writer encodes palette
    // indices verbatim (no quantization), so sample values round-trip
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, framePixel(id, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL video decode: ImageIO's GIF sequence reader → (width, height,
    * [n_frames, mean, min, max] of luminance over the frames selected by
    * `sampleEvery` — decode cost scales with frames/sampleEvery, not
    * frames). None on undecodable bytes — never throws.
    */
  def decodeVideo(blob: Array[Byte],
      sampleEvery: Int = 1): Option[(Int, Int, Array[Double])] =
    try {
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n <= 0) None
        else {
          val step = math.max(1, sampleEvery)
          var w = 0
          var h = 0
          var sum = 0.0
          var cnt = 0L
          var mn = Double.MaxValue
          var mx = Double.MinValue
          var f = 0
          while (f < n) {
            val img = reader.read(f)
            w = img.getWidth
            h = img.getHeight
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                // GIF frames decode as indexed rasters — read through the
                // color model (blue channel == gray for a gray palette)
                val v = (img.getRGB(x, y) & 0xff).toDouble
                sum += v
                if (v < mn) mn = v
                if (v > mx) mx = v
                x += 1
              }
              y += 1
            }
            cnt += w.toLong * h
            f += step
          }
          Some((w, h, Array(n.toDouble, sum / math.max(1L, cnt), mn, mx)))
        }
      } finally {
        reader.dispose()
        iis.close()
      }
    } catch { case _: Exception => None }

  /** Resize image blobs to fit within (maxW, maxH), aspect preserved,
    * re-encoded as PNG — the training-pipeline thumbnail/normalize step,
    * partition-parallel over the binary column. Images already inside the
    * box, non-image rows, and undecodable blobs pass through unchanged.
    * Target dims use floor(scale * dim) (min 1), so an oracle can compute
    * them from the declared metadata with integer math.
    */
  def resizeImages(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { row =>
      if (row.kind != "image") row
      else {
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(row.blob))
          if (img == null || (img.getWidth <= maxW && img.getHeight <= maxH)) row
          else {
            val scale = math.min(maxW.toDouble / img.getWidth,
              maxH.toDouble / img.getHeight)
            val w = math.max(1, math.floor(img.getWidth * scale).toInt)
            val h = math.max(1, math.floor(img.getHeight * scale).toInt)
            val tpe =
              if (img.getType == java.awt.image.BufferedImage.TYPE_CUSTOM)
                java.awt.image.BufferedImage.TYPE_INT_RGB
              else img.getType
            val out = new java.awt.image.BufferedImage(w, h, tpe)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            row.copy(blob = bos.toByteArray, width = w, height = h)
          }
        } catch { case _: Exception => row }
      }
    }
  }

  /** Frame-sample video blobs into IMAGE rows: every `everyK`-th frame
    * re-encoded as its own PNG — the keyframe-extraction step a video
    * corpus runs before image-level dedup/embedding. Derived rows carry
    * lineage as explicit (parent_id, frame_idx) columns — no packed-id
    * convention, so frames can never collide with original media ids and
    * arbitrarily large parent ids / frame counts are safe. Non-video rows
    * drop; undecodable blobs yield no rows. Partition-parallel flatMap,
    * no shuffle. `maxFrames` bounds per-row task memory: the sampled PNGs
    * of ONE video buffer in a single flatMap call, so a pathological
    * 200k-frame input must cap, not OOM the executor.
    */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int,
      maxFrames: Int = 1000): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val step = math.max(1, everyK)
    media.filter(_.kind == "video").flatMap { row =>
      // non-GIF containers: the ffmpeg-CLI seam samples frames when the
      // binaries are present; otherwise the row contributes no frames
      // (same as any undecodable blob below)
      if (row.blob != null && row.blob.length >= 4 &&
          !(row.blob(0) == 'G' && row.blob(1) == 'I' && row.blob(2) == 'F') &&
          !isGft(row.blob)) {
        FfmpegCodec.sampleFrames(row.blob, step, maxFrames).map {
          case (idx, png, w, h) => FrameRow(row.media_id, idx, "image", png, w, h)
        }
      } else try {
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(row.blob))
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val out = Vector.newBuilder[FrameRow]
          var emitted = 0
          var f = 0
          while (f < n && emitted < maxFrames) {
            val img = reader.read(f)
            // re-encode through a plain gray/RGB raster (the PNG writer
            // does not take indexed GIF rasters' palette with it). Copy
            // SAMPLES, not drawImage: Graphics2D converts sRGB → the gray
            // type's linear color space, which gammas the values
            val gray = img.getColorModel.getNumComponents == 1 ||
              img.getType == java.awt.image.BufferedImage.TYPE_BYTE_INDEXED
            val frame = new java.awt.image.BufferedImage(
              img.getWidth, img.getHeight,
              if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
              else java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                if (gray) frame.getRaster.setSample(x, y, 0, rgb & 0xff)
                else frame.setRGB(x, y, rgb)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(frame, "png", bos)
            out += FrameRow(row.media_id, f, "image",
              bos.toByteArray, img.getWidth, img.getHeight)
            emitted += 1
            f += step
          }
          out.result()
        } finally {
          reader.dispose()
          iis.close()
        }
      } catch { case _: Exception => Vector.empty }
    }
  }

  private def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'

  /** The deterministic GFT stub header — known cheap magic, so stub blobs
    * never pay a process spawn + temp file just for ffprobe to reject them
    * (and bench timings stay comparable between ffmpeg-present and
    * ffmpeg-absent environments).
    */
  private def isGft(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 &&
      bytes(0) == 'G' && bytes(1) == 'F' && bytes(2) == 'T'

  private def isRiffWave(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** REAL image decode: ImageIO (JDK codecs — PNG/JPEG/GIF/BMP) → width,
    * height, and first-band stats [n_pixels, mean, min, max]. None on
    * undecodable bytes — never throws.
    */
  def decodeImage(blob: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        var sum = 0.0
        var mn = Double.MaxValue
        var mx = Double.MinValue
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSampleDouble(x, y, 0)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        val n = math.max(1, w * h)
        Some((w, h, Array(n.toDouble, sum / n, mn, mx)))
      }
    } catch { case _: Exception => None }

  /** Fallback kernel for container formats with no JDK codec (e.g. MP4) —
    * a production build replaces this body with a real codec (e.g. JNI
    * ffmpeg). Parses the deterministic GFT test header. Contract: bytes →
    * (width, height, feature vector); deterministic; never throws on any
    * input.
    */
  def decodeStub(blob: Array[Byte]): (Int, Int, Array[Double]) = {
    if (blob == null || blob.length < 8 ||
        !(blob(0) == 'G' && blob(1) == 'F' && blob(2) == 'T')) {
      (0, 0, Array.fill(4)(0.0))
    } else {
      val w = ((blob(4) & 0xff) << 8) | (blob(5) & 0xff)
      val h = ((blob(6) & 0xff) << 8) | (blob(7) & 0xff)
      // fake "feature": 4 byte-histogram moments over the payload
      val payload = blob.drop(8)
      val n = math.max(1, payload.length)
      val mean = payload.map(b => (b & 0xff).toDouble).sum / n
      val mx = if (payload.isEmpty) 0.0 else payload.map(b => (b & 0xff).toDouble).max
      val mn = if (payload.isEmpty) 0.0 else payload.map(b => (b & 0xff).toDouble).min
      (w, h, Array(n.toDouble, mean, mn, mx))
    }
  }

  /** Partition-parallel decode + feature extraction over the binary column.
    * This is the mapPartitions shape a Pandas-UDF/mapInPandas pipeline has
    * in PySpark — in Scala the iterator IS the batch; one decoder instance
    * per partition, amortized over all its rows.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts, buffers)
      rows.map { r =>
        val bytes = if (r.blob == null) Array.emptyByteArray else r.blob
        val zero = (0, 0, Array.fill(4)(0.0))
        // decoded (width, height) carries the modality's natural shape:
        // images (pixel w, pixel h); audio (sample_rate, channels);
        // video (frame w, frame h) with frame-sampled stats. Dispatch is
        // by the row's declared kind (the typed metadata contract) — the
        // codec itself sniffs the concrete format (ImageIO handles
        // PNG/JPEG/GIF/BMP, AudioSystem WAV/AIFF/AU) — with the GFT stub
        // as the fallback for containers the JDK cannot read (e.g. MP4).
        val (w, h, feat) = r.kind match {
          case "image" => decodeImage(bytes).getOrElse(zero)
          case "audio" => decodeAudio(bytes).getOrElse(zero)
          case "video" =>
            // non-GIF containers (MP4 etc.) go through the ffmpeg-CLI seam
            // when the binaries are on PATH; otherwise (and for bytes no
            // container accepts, e.g. the GFT header) the stub fallback —
            // deterministic in both environments
            if (isGif(bytes)) decodeVideo(bytes).getOrElse(zero)
            else if (isGft(bytes)) decodeStub(bytes)
            else FfmpegCodec.probe(bytes).getOrElse(decodeStub(bytes))
          case _ => // untyped rows: sniff by magic, stub as last resort
            if (isGif(bytes)) decodeVideo(bytes).getOrElse(zero)
            else if (isRiffWave(bytes)) decodeAudio(bytes).getOrElse(zero)
            else decodeImage(bytes).getOrElse(decodeStub(bytes))
        }
        MediaFeatures(r.media_id, r.kind, bytes.length,
          w, h, graft.core.XxHash64.hash(bytes, 0L), feat.toSeq)
      }
    }
  }

  /** Metadata-only pass (no decode): pure column ops on the blob — stays in
    * whole-stage codegen, demonstrating that blob plumbing needs no UDF for
    * length/checksum/partitioning work.
    */
  def mediaMeta(media: Dataset[MediaRow]): DataFrame = {
    media.toDF().select(
      col("media_id"), col("kind"),
      length(col("blob")).as("n_bytes"),
      col("width"), col("height"),
      md5(col("blob")).as("blob_md5"))
  }
}
