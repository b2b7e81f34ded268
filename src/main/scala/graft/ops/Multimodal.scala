package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample run as partition-parallel transforms over those
  * blobs.
  *
  * IMAGE decode is REAL: `javax.imageio.ImageIO` (in the JDK — PNG, JPEG,
  * GIF, BMP) turns the blob into width/height plus first-band luminance
  * statistics, and the synthetic corpus carries genuine PNG bytes with
  * deterministic pixels. Audio/video decode remains a DETERMINISTIC STUB
  * (no such codecs ship in the JDK): it parses the fake GFT header we
  * synthesize; everything around it — schema, batching, partition shape,
  * column contracts — is the real Spark plumbing a production codec drops
  * into.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
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
    * image rows carry REAL PNG bytes (deterministic pixels), audio/video
    * rows a fake GFT header + UTF-8 payload (the declared decode-stub
    * seam). Stands in for crawled media in tests and benchmarks.
    */
  def synthesizeMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val w = 16 + (id % 64).toInt
        val h = 16 + (id % 48).toInt
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        val blob =
          if (kind == "image") encodePng(id, w, h)
          else {
            val payload = (if (t == null) "" else t).getBytes("UTF-8")
            Array[Byte]('G', 'F', 'T', '1',
              (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++ payload
          }
        MediaRow(id, kind, blob, w, h)
      }
  }

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

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

  /** STUB decode kernel for audio/video — a production build replaces this
    * body with a real codec (e.g. JNI ffmpeg). Contract: bytes → (width,
    * height, feature vector); deterministic; never throws on any input.
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
        val isPng = bytes.length >= 4 && PngMagic.indices.forall(i => bytes(i) == PngMagic(i))
        val (w, h, feat) =
          if (isPng) decodeImage(bytes).getOrElse((0, 0, Array.fill(4)(0.0)))
          else decodeStub(bytes)
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
