package graft.core

import java.net.URI
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** URL canonicalization + hashing — the single shared definition used by the
  * frontier, the seen-set and link extraction (north rule: "canonicalized +
  * hashed URLs").
  *
  * Behavior modeled on the reference link pipeline:
  *  - fragment stripped before resolution
  *    (`Abot/Core/HyperLinkParser.cs:104-108`)
  *  - relative resolution against the page URL or `<base href>`, with
  *    `//host` base fixed up with the page scheme (`HyperLinkParser.cs:85-96`)
  *  - lowercased scheme/host, default ports dropped, trailing host dot
  *    removed (C#'s Uri class does this implicitly; trailing-dot patch
  *    `Abot/Crawler/WebCrawler.cs:140-160`)
  *  - empty path normalized to "/"
  *  - hash = low 64 bits (little-endian) of MD5(canonical URL), the exact
  *    scheme of `Abot/Core/CompactCrawledUrlRepository.cs:39-58`.
  */
object UrlCanonicalizer {

  /** Resolve `href` against `baseUrl` and canonicalize. Returns None for
    * unparseable or non-http(s) results (the reference silently drops links
    * that fail Uri parsing, `HyperLinkParser.cs:110-121`).
    */
  def resolve(baseUrl: String, href: String): Option[String] = {
    try {
      val noFrag = href.split('#')(0)
      val base = new URI(baseUrl.split('#')(0))
      val fixed =
        if (noFrag.startsWith("//")) base.getScheme + ":" + noFrag else noFrag
      val resolved =
        if (fixed.isEmpty) base
        else base.resolve(encodeSpaces(fixed))
      canonicalize(resolved.toString)
    } catch { case _: Exception => None }
  }

  /** Canonicalize an absolute URL string. */
  def canonicalize(url: String): Option[String] = {
    try {
      val u = new URI(url.split('#')(0).trim).normalize()
      val scheme = Option(u.getScheme).map(_.toLowerCase).orNull
      if (scheme != "http" && scheme != "https") return None
      var host = Option(u.getHost).map(_.toLowerCase).orNull
      if (host == null) return None
      while (host.endsWith(".")) host = host.dropRight(1)
      val defaultPort = if (scheme == "https") 443 else 80
      val port = if (u.getPort == -1 || u.getPort == defaultPort) -1 else u.getPort
      var path = Option(u.getRawPath).getOrElse("")
      if (path.isEmpty) path = "/"
      // java.net.URI.normalize can leave leading "../" on rootless paths:
      while (path.startsWith("/../")) path = "/" + path.stripPrefix("/../")
      val sb = new StringBuilder(scheme).append("://").append(host)
      if (port != -1) sb.append(':').append(port)
      sb.append(path)
      val q = u.getRawQuery
      if (q != null) sb.append('?').append(q)
      Some(sb.toString)
    } catch { case _: Exception => None }
  }

  private def encodeSpaces(s: String): String = s.replace(" ", "%20")

  /** host (authority without port) of a canonical URL; "" if unparseable. */
  def host(canonicalUrl: String): String =
    try Option(new URI(canonicalUrl).getHost).getOrElse("")
    catch { case _: Exception => "" }

  /** path + query, the robots-matching input (C# Uri.PathAndQuery). */
  def pathAndQuery(canonicalUrl: String): String =
    try {
      val u = new URI(canonicalUrl)
      val p = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/")
      val q = Option(u.getRawQuery).map("?" + _).getOrElse("")
      p + q
    } catch { case _: Exception => "/" }

  /** Low 64 bits of MD5(url), little-endian — the seen-set key
    * (`CompactCrawledUrlRepository.cs:39-58`).
    */
  def urlHash(canonicalUrl: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(canonicalUrl.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }
}

/** Crawl scope predicate — which candidate URLs belong to the crawl
  * (`wordslab.webscraper/html/HtmlFileUtils.cs:14-81`).
  */
object ScopeFilter {
  sealed trait Scope
  case object Domain extends Scope    // same base domain (last 2 DNS labels)
  case object SubDomain extends Scope // same full host
  case object Path extends Scope      // same host + root path prefix

  def baseDomain(host: String): String = {
    val tokens = host.split('.')
    if (tokens.length < 3) host
    else tokens(tokens.length - 2) + "." + tokens(tokens.length - 1)
  }

  /** `HtmlFileUtils.GetRootPath:69-81`: directory prefix of the root path,
    * cut at the last '/' before the first '.' (file-extension heuristic).
    */
  def rootPath(absolutePath: String): String = {
    val dotIndex = absolutePath.indexOf('.')
    if (dotIndex > 0) {
      val slashIndex = absolutePath.lastIndexOf('/', dotIndex)
      if (slashIndex >= 0) return absolutePath.substring(0, slashIndex + 1)
    }
    absolutePath
  }

  def shouldCrawl(scope: Scope, candidateUrl: String, rootUrl: String): Boolean = {
    val cHost = UrlCanonicalizer.host(candidateUrl)
    val rHost = UrlCanonicalizer.host(rootUrl)
    if (cHost.isEmpty || rHost.isEmpty) return false
    scope match {
      case Domain => baseDomain(cHost) == baseDomain(rHost)
      case SubDomain => cHost == rHost
      case Path =>
        cHost == rHost && {
          val cPath = UrlCanonicalizer.pathAndQuery(candidateUrl).split('?')(0)
          val rPath = UrlCanonicalizer.pathAndQuery(rootUrl).split('?')(0)
          cPath.startsWith(rootPath(rPath))
        }
    }
  }
}
