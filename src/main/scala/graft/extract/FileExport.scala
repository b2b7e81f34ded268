package graft.extract

import graft.core.ScopeFilter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Per-document file-tree export — the reference's browsable output layout
  * (`html/HtmlFileUtils.cs:102-166` URL→path mapping +
  * `NLPTextDocumentWriter.cs:23-133` per-format file naming): every
  * document's three renderings land at
  * `<outDir>/<websitePath>/<url-derived path>.<lang>.{text.md,
  * dataframe.csv,preview.html}`.
  *
  * Writes are partition-parallel (executor-side `foreachPartition`, no
  * driver fan-in); like the reference the target is a filesystem path —
  * on a real cluster point it at a shared mount.
  */
object FileExport {

  /** The reference sanitizes with `Path.GetInvalidFileNameChars()` minus
    * '/'; it runs on Windows, so we pin the Windows set (control chars +
    * the nine specials) for a deterministic, strictly-safe cross-platform
    * layout.
    */
  private val InvalidFileChars: Set[Char] =
    (0 until 32).map(_.toChar).toSet ++ Set('"', '<', '>', '|', ':', '*', '?', '\\')

  private val MultipleDotsInPath = "\\.+/".r

  /** `HtmlFileUtils.GetPathValidChars`: URL-decode, replace each invalid
    * filename char with '_', collapse "dots-then-slash" runs to "/"
    * (defangs ".." path traversal in URL segments).
    */
  def pathValidChars(path: String): String = {
    val decoded =
      try java.net.URLDecoder.decode(path, StandardCharsets.UTF_8)
      catch { case _: Exception => path }
    val replaced = decoded.map(c => if (InvalidFileChars.contains(c)) '_' else c)
    MultipleDotsInPath.replaceAllIn(replaced, "/")
  }

  /** `HtmlFileUtils.GetWebsitePathFromUri`: the per-website directory name
    * derived from the crawl scope — base domain for Domain scope, full
    * host for SubDomain, host + root path (slashes to underscores) for
    * Path.
    */
  def websitePath(scope: ScopeFilter.Scope, rootUrl: String): String = {
    val uri = new java.net.URI(rootUrl)
    val host = Option(uri.getHost).getOrElse("")
    val raw = scope match {
      case ScopeFilter.Domain => ScopeFilter.baseDomain(host)
      case ScopeFilter.SubDomain => host
      case ScopeFilter.Path =>
        host + ScopeFilter.rootPath(
          Option(uri.getPath).filter(_.nonEmpty).getOrElse("/")).replace("/", "_")
    }
    pathValidChars(raw)
  }

  /** `HtmlFileUtils.GetFilePathFromUri`: relative path under the website
    * directory — sanitized intermediate URI segments, then the file name
    * (`_default_` when the path ends in '/'), with an uppercase-MD5 of
    * the query (INCLUDING its leading '?', as C# `Uri.Query` yields it)
    * appended when present.
    */
  def filePathFromUrl(url: String): String = {
    val uri = new java.net.URI(url)
    val absPath = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
    val sb = new StringBuilder
    // intermediate segments (those ending in '/'), root '/' excluded
    val segs = absPath.split("(?<=/)") // keep trailing slashes on segments
    segs.foreach { seg =>
      if (seg != "/" && seg.endsWith("/")) sb.append(pathValidChars(seg))
    }
    val lastSlash = absPath.lastIndexOf('/')
    var fileName = if (lastSlash >= 0) absPath.substring(lastSlash + 1) else absPath
    if (fileName.isEmpty) fileName = "_default_"
    val rawQuery = Option(uri.getRawQuery).getOrElse("")
    if (rawQuery.nonEmpty) {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("?" + rawQuery).getBytes(StandardCharsets.UTF_8))
      fileName += "_" + md.map("%02X".format(_)).mkString
    }
    sb.append(pathValidChars(fileName))
    sb.toString
  }

  /** `NLPTextDocumentWriter.GetFullFilePath`: base path + language
    * extension ("xx" when unknown) + format extension.
    */
  def languageCode(lang: String): String =
    if (lang == null || lang.isEmpty || lang == "?") "xx" else lang

  /** Write all three renderings for every document, partition-parallel.
    * `rendered` columns: doc_id, lang, markdown, preview_html, csv.
    * Files go through the Hadoop FileSystem resolved from `contentDir`
    * (executors on a cluster must hit the SHARED filesystem — hdfs://,
    * s3a://, a mounted file:// — not their local disks; locally this is
    * plain file:// with zero behavior change). Returns the number of
    * documents written.
    */
  def writeFiles(rendered: DataFrame, contentDir: String): Long = {
    val spark = rendered.sparkSession
    import spark.implicits._
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // distinct URLs can sanitize to the SAME path ('a:b' and 'a?b' both
    // become 'a_b'): detect collisions on the derived base path and suffix
    // a short URL hash, so no document silently overwrites another —
    // deterministic (every member of a colliding group gets its suffix,
    // no order dependence), one hash-partitioned shuffle on the base path
    val basePathUdf = org.apache.spark.sql.functions.udf(
      (url: String) => filePathFromUrl(url))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"base")
    val rows = rendered
      .select($"doc_id", $"lang", $"markdown", $"preview_html", $"csv")
      .withColumn("base", basePathUdf($"doc_id"))
      .withColumn("base",
        when(count(lit(1)).over(w) > 1,
          concat($"base", lit("_"), upper(substring(md5($"doc_id"), 1, 8))))
        .otherwise($"base"))
      .select($"doc_id", $"lang", $"markdown", $"preview_html", $"csv", $"base")
      .as[(String, String, String, String, String, String)]
      .persist()
    rows.foreachPartition { it: Iterator[(String, String, String, String, String, String)] =>
      import org.apache.hadoop.fs.{FileSystem, Path => HPath}
      val root = new HPath(contentDir)
      // a PRIVATE FileSystem instance so disabling .crc sidecars (the
      // user-facing tree should not carry them on a local fs) never
      // mutates the JVM-wide cached instance Spark itself writes through
      val fs: FileSystem = FileSystem.newInstance(
        root.getFileSystem(confSer.value).makeQualified(root).toUri, confSer.value)
      try {
        fs.setWriteChecksum(false)
        // BOM-prefixed UTF-8, matching the reference writer's
        // `new UTF8Encoding(true)` (NLPTextDocumentWriter.cs:27)
        def write(path: HPath, s: String): Unit = {
          val out = fs.create(path, true) // creates parent dirs itself
          try {
            out.write(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
            out.write(s.getBytes(StandardCharsets.UTF_8))
          } finally out.close()
        }
        it.foreach { case (url, lang, md, html, csv, basePath) =>
          val base = basePath + "." + languageCode(lang)
          write(new HPath(root, base + ".text.md"), md)
          write(new HPath(root, base + ".dataframe.csv"), csv)
          write(new HPath(root, base + ".preview.html"), html)
        }
      } finally fs.close()
    }
    val n = rows.count()
    rows.unpersist()
    n
  }
}
