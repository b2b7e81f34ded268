package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample run as partition-parallel transforms over those
  * blobs.
  *
  * The container ships no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (clearly marked below): it parses a tiny fake header
  * we synthesize (magic + width + height) and "extracts" a feature vector
  * from the raw bytes. Everything around it — schema, batching, partition
  * shape, column contracts — is the real Spark plumbing a production codec
  * would drop into.
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

  /** Synthesize a deterministic media table from any (id, text) table:
    * blob = fake header + UTF-8 payload. Stands in for real image bytes in
    * tests and benchmarks.
    */
  def synthesizeMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val payload = (if (t == null) "" else t).getBytes("UTF-8")
        val w = 16 + (id % 64).toInt
        val h = 16 + (id % 48).toInt
        val header = Array[Byte]('G', 'F', 'T', '1',
          (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte)
        MediaRow(id, if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
          header ++ payload, w, h)
      }
  }

  /** STUB decode kernel — a production build replaces this body with a real
    * codec (e.g. JNI libjpeg / ffmpeg). Contract: bytes → (width, height,
    * feature vector); deterministic; never throws on any input.
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
        val (w, h, feat) = decodeStub(r.blob)
        val bytes = if (r.blob == null) Array.emptyByteArray else r.blob
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
