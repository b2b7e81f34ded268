package graft.ops

/** ffmpeg-CLI seam for container formats the JDK cannot decode (MP4, WebM,
  * MKV, ...): when `ffprobe` + `ffmpeg` binaries are on PATH, non-GIF
  * video rows decode through them (probe → dims/frame stats; frame
  * sampling → PNG rows); when the binaries are absent — as in this
  * sandbox — every entry point returns None/empty and callers fall back
  * to `Multimodal.decodeStub`, which remains the documented seam.
  *
  * CLI, not JNI: zero build/runtime dependencies, the binary gate is
  * probed once per JVM, and at probe/sample granularity process-spawn
  * cost is dwarfed by the decode itself. Blobs round-trip through a
  * per-call temp file (ffprobe needs a seekable input for MP4 moov
  * atoms); the file is always deleted.
  */
object FfmpegCodec {

  /** One probe per JVM: both binaries must run. */
  lazy val available: Boolean = binaryWorks("ffprobe") && binaryWorks("ffmpeg")

  private def binaryWorks(name: String): Boolean =
    try {
      val p = new ProcessBuilder(name, "-version")
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  /** Temp-file round-trip with the decode path's never-throws contract: a
    * full or read-only /tmp yields the fallback (None/empty), never a
    * failed Spark task.
    */
  private def withTemp[T](blob: Array[Byte], onError: => T)(
      f: java.nio.file.Path => T): T = {
    var tmp: java.nio.file.Path = null
    try {
      tmp = java.nio.file.Files.createTempFile("graft-media", ".bin")
      java.nio.file.Files.write(tmp, blob)
      f(tmp)
    } catch {
      case _: Exception => onError
    } finally {
      if (tmp != null) java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** Run a CLI, return its stdout on exit 0. stderr is DISCARDED at the OS
    * level — draining it through the parent would deadlock once a hostile
    * blob makes ffmpeg emit more error text than the pipe buffer while the
    * parent still waits on stdout (and merging it into stdout would
    * corrupt the ffprobe parse).
    */
  private def run(cmd: String*): Option[String] =
    try {
      val p = new ProcessBuilder(cmd: _*)
        .redirectError(ProcessBuilder.Redirect.DISCARD).start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: Exception => None }

  /** First video stream's (width, height, [n_frames, duration_sec, 0, 0])
    * — decodeStub-shaped so `Multimodal.extractFeatures` splices it in
    * directly. None when ffmpeg is absent or the bytes aren't a container
    * ffprobe accepts (e.g. the GFT stub header), so the stub fallback
    * stays deterministic in both environments. key=value output is parsed
    * BY KEY — ffprobe prints -show_entries fields in the stream section's
    * canonical order, not the requested order, so positional CSV parsing
    * would swap nb_frames and duration.
    */
  def probe(blob: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (!available || blob == null || blob.length == 0) return None
    withTemp(blob, Option.empty[(Int, Int, Array[Double])]) { tmp =>
      run("ffprobe", "-v", "error", "-select_streams", "v:0",
        "-show_entries", "stream=width,height,nb_frames,duration",
        "-of", "default=noprint_wrappers=1", tmp.toString).flatMap { out =>
        val kv = out.linesIterator.flatMap { line =>
          line.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim)
            case _ => None
          }
        }.toMap
        def num(k: String): Double =
          kv.get(k).flatMap(_.toDoubleOption).getOrElse(0.0) // "N/A" → 0
        val w = num("width").toInt
        val h = num("height").toInt
        if (w <= 0 || h <= 0) None
        else Some((w, h, Array(num("nb_frames"), num("duration"), 0.0, 0.0)))
      }
    }
  }

  /** Every `step`-th frame of the first video stream as PNG bytes, at most
    * `maxFrames` rows: (frame_idx, png, width, height). Empty when ffmpeg
    * is absent or the bytes don't decode.
    */
  def sampleFrames(blob: Array[Byte], step: Int,
      maxFrames: Int): Vector[(Int, Array[Byte], Int, Int)] = {
    if (!available || blob == null || blob.length == 0) return Vector.empty
    val st = math.max(1, step)
    withTemp(blob, Vector.empty[(Int, Array[Byte], Int, Int)]) { tmp =>
      val outDir = java.nio.file.Files.createTempDirectory("graft-frames")
      try {
        // select every st-th frame; -vsync 0 keeps input frame numbering
        val ok = run("ffmpeg", "-v", "error", "-i", tmp.toString,
          "-map", "0:v:0", "-vf", s"select=not(mod(n\\,$st))",
          "-vsync", "0", "-frames:v", maxFrames.toString,
          "-c:v", "png", "-f", "image2",
          outDir.resolve("f%05d.png").toString).isDefined
        if (!ok) Vector.empty
        else {
          val files = java.nio.file.Files.list(outDir)
          try {
            import scala.jdk.CollectionConverters._
            files.iterator().asScala.toVector.sortBy(_.getFileName.toString)
              .zipWithIndex.flatMap { case (f, i) =>
                val bytes = java.nio.file.Files.readAllBytes(f)
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes))
                if (img == null) None
                else Some((i * st, bytes, img.getWidth, img.getHeight))
              }
          } finally files.close()
        }
      } finally {
        val files = java.nio.file.Files.list(outDir)
        try {
          import scala.jdk.CollectionConverters._
          files.iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        } finally files.close()
        java.nio.file.Files.deleteIfExists(outDir)
      }
    }
  }
}
