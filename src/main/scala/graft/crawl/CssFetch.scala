package graft.crawl

import graft.core.UrlCanonicalizer
import scala.collection.mutable

/** Same-host external-stylesheet fetch for the hidden-element filter (F8):
  * `<link rel=stylesheet href=...>` targets are fetched alongside the page
  * and their display/visibility rules feed `HtmlToSpans` — closing the gap
  * to the reference's patched-AngleSharp behavior, which loads linked CSS
  * and evaluates exactly these two properties
  * (`doc/dependencies patches summary.txt` patches 2-3,
  * `WebsiteTextExtractor.cs:189-205`).
  *
  * Guard rails for a 10^10-URL crawl:
  *  - SAME-HOST only (cross-origin sheets are someone else's crawl budget
  *    and someone else's politeness);
  *  - content-type gated to `text/css` (a MISSING type is tolerated only
  *    when the URL path ends in .css, so header-less test fetchers work
  *    but an arbitrary typeless 200 is never evaluated as CSS);
  *  - at most `MaxSheetsPerPage` sheets, `MaxCssChars` total text per page
  *    (the text rides the fetch→extract shuffle — it must stay bounded);
  *  - a PER-PARTITION cache, so a host's shared sheet is fetched once per
  *    fetch task, not once per page (hosts are partition-local by the
  *    host-bucketed repartition, so the hit rate is that of a per-host
  *    cache). Politeness pacing applies to the CSS requests automatically:
  *    they go through the same Fetcher as the pages.
  */
object CssFetch {

  val MaxSheetsPerPage = 5
  val MaxCssChars: Int = 256 * 1024

  private val LinkTagRe = "(?i)<link\\b[^>]*>".r
  private val RelStylesheetRe = "(?i)\\brel\\s*=\\s*[\"']?\\s*stylesheet".r
  private val HrefRe =
    "(?i)\\bhref\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>\"']+))".r

  /** Allocation-free case-insensitive substring test — the pre-gate must
    * match the case-insensitive link regexes (`REL="Stylesheet"` is legal
    * HTML) without lowercasing a 100 KB body per page.
    */
  private def containsIgnoreCase(s: String, needle: String): Boolean = {
    val n = needle.length
    var i = 0
    while (i <= s.length - n) {
      if (s.regionMatches(true, i, needle, 0, n)) return true
      i += 1
    }
    false
  }

  /** Resolved same-host stylesheet URLs of a page, document order, deduped. */
  def stylesheetUrls(html: String, pageUrl: String, host: String): Vector[String] = {
    val out = mutable.LinkedHashSet.empty[String]
    LinkTagRe.findAllIn(html).foreach { tag =>
      if (RelStylesheetRe.findFirstIn(tag).isDefined) {
        HrefRe.findFirstMatchIn(tag).foreach { m =>
          val href = Seq(m.group(1), m.group(2), m.group(3))
            .find(_ != null).getOrElse("")
          if (href.nonEmpty)
            UrlCanonicalizer.resolve(pageUrl, href)
              .filter(u => UrlCanonicalizer.host(u) == host)
              .foreach(out.add)
        }
      }
    }
    out.take(MaxSheetsPerPage).toVector
  }

  /** Concatenated stylesheet text for one page. `fetch` returns
    * (status, contentType, body) — the engine passes the partition's
    * Fetcher, the sequential oracle its site-map lookup, so both sides
    * evaluate identical CSS. `cache` memoizes per fetch task.
    */
  def cssFor(html: String, pageUrl: String, host: String,
      fetch: String => (Int, String, String),
      cache: mutable.Map[String, String]): String = {
    if (!containsIgnoreCase(html, "stylesheet")) return "" // cheap pre-gate
    val sb = new StringBuilder
    stylesheetUrls(html, pageUrl, host).foreach { u =>
      if (sb.length < MaxCssChars) {
        val css = cache.getOrElseUpdate(u, {
          val (status, contentType, body) = fetch(u)
          val mime = HttpFetcher.mimeOf(contentType)
          // a missing Content-Type is tolerated ONLY when the URL path
          // itself says .css — a header-less fetcher (tests) still works,
          // but an arbitrary 200 with no type is never evaluated as CSS
          val cssByPath =
            UrlCanonicalizer.pathAndQuery(u).takeWhile(_ != '?').endsWith(".css")
          if (status == 200 && (mime == "text/css" || (mime == "" && cssByPath)))
            body.take(MaxCssChars)
          else ""
        })
        if (css.nonEmpty) {
          if (sb.nonEmpty) sb.append('\n')
          sb.append(css.take(MaxCssChars - sb.length))
        }
      }
    }
    sb.toString
  }
}
