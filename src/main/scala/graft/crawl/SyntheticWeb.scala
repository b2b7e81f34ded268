package graft.crawl

import graft.core.{Span, SpanKinds, XxHash64}
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic web fixture generator (FIXTURES.md §2).
  *
  * All decisions are pure functions of (seed, host index, page index, field
  * tag) through XXH64, so generation is order-independent, reproducible, and
  * can be scaled up for the benchmark without changing small-scale content.
  *
  * The generator builds a page MODEL first, then renders HTML from it and
  * computes the ground-truth expected span sequence from the same model —
  * so extractor correctness is checked against spans known by construction,
  * never against the extractor itself.
  */
object SyntheticWeb {

  final case class Site(
      pages: Map[String, SyntheticPage],
      robots: Map[String, String], // host -> robots.txt content ("" = none)
      expected: Map[String, PageExpectation],
      rootUrl: String)

  final case class PageExpectation(
      title: String,
      spans: Vector[Span],
      rawHrefs: Vector[String])

  // --- deterministic pseudo-randomness -------------------------------
  private def rnd(seed: Long, parts: String): Long =
    XxHash64.hash(s"$seed|$parts".getBytes("UTF-8"), seed)
  private def rndInt(seed: Long, parts: String, bound: Int): Int =
    math.floorMod(rnd(seed, parts), bound.toLong).toInt

  private val hostLangs = Vector("en", "fr", "de", "es")
  private val langWords: Map[String, Vector[String]] = Map(
    "en" -> Vector("the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with"),
    "fr" -> Vector("le", "la", "les", "de", "et", "est", "en", "dans", "que", "pour", "sur"),
    "de" -> Vector("der", "die", "das", "und", "ist", "von", "mit", "auf", "nicht", "eine", "als"),
    "es" -> Vector("el", "la", "los", "de", "que", "en", "una", "por", "con", "para", "como"))

  def hostName(i: Int): String = s"www.host$i.example$i.com"
  /** subdomain-mode hosts share the base domain (Domain-scope crawls span
    * them all) — used by the crawl benchmark. */
  def hostNameOf(spec: Spec, i: Int): String =
    if (spec.sharedDomain) s"h$i.graftbench.com" else hostName(i)
  def hostLang(seed: Long, i: Int): String = hostLangs(rndInt(seed, s"lang/$i", hostLangs.size))
  def pageUrl(i: Int, j: Int): String = pageUrlOf(null, i, j)
  def pageUrlOf(spec: Spec, i: Int, j: Int): String = {
    val h = if (spec == null) hostName(i) else hostNameOf(spec, i)
    if (j >= 0) s"https://$h/p$j.html"
    else s"https://$h/private/secret${-j}.html"
  }
  def rootUrl(i: Int): String = pageUrl(i, 0)

  /** Number of pages for host i (host 0 is the hot host). */
  def pagesOfHost(spec: Spec, i: Int): Int =
    if (i == 0) spec.pagesPerHost * spec.hotHostFactor else spec.pagesPerHost

  final case class Spec(
      hosts: Int = 3,
      pagesPerHost: Int = 10,
      hotHostFactor: Int = 3,
      fanout: Int = 3,
      seed: Long = 42L,
      treeLinks: Boolean = false,   // j -> j*fanout+1..j*fanout+fanout (BFS depth ~log_f n)
      sharedDomain: Boolean = false) // all hosts under one base domain

  def generate(spec: Spec): Site = {
    val pages = Map.newBuilder[String, SyntheticPage]
    val expected = Map.newBuilder[String, PageExpectation]
    val robots = Map.newBuilder[String, String]

    for (i <- 0 until spec.hosts) {
      val host = hostNameOf(spec, i)
      // sharedDomain (bench) mode keeps delays at 0 so politeness caps stay
      // real but non-binding; fixture mode exercises 0..2 s delays
      val delay = if (spec.sharedDomain) 0 else rndInt(spec.seed, s"delay/$i", 3)
      robots += host -> s"""User-agent: *
                           |Disallow: /private/
                           |Disallow: /*.pdf$$
                           |Crawl-delay: $delay
                           |""".stripMargin
      val n = pagesOfHost(spec, i)
      for (j <- 0 until n) {
        val (page, exp) = buildPage(spec, i, j, n)
        pages += page.url -> page
        expected += page.url -> exp
        // a couple of disallowed pages exist (fetchable only if robots fail)
        if (j % 7 == 3) {
          val secretUrl = pageUrl(i, -(j + 1))
          pages += secretUrl -> SyntheticPage(secretUrl, host, 200, "text/html", null,
            s"<html><body><p>secret $i $j</p></body></html>")
        }
        // a redirect page every 11 pages
        if (j % 11 == 5) {
          val rUrl = s"https://$host/r$j.html"
          pages += rUrl -> SyntheticPage(rUrl, host, 301, "text/html", pageUrlOf(spec, i, (j + 1) % n), "")
        }
      }
    }
    Site(pages.result(), robots.result(), expected.result(), pageUrlOf(spec, 0, 0))
  }

  // --- page model ------------------------------------------------------

  private sealed trait Item
  private final case class Heading(level: Int, text: String) extends Item
  private final case class Para(text: String) extends Item
  private final case class ImgPara(before: String, alt: String, src: String, after: String) extends Item
  private final case class ListBlock(items: Vector[String], nav: Boolean, hrefs: Vector[String]) extends Item
  private final case class TableBlock(cells: Vector[Vector[String]]) extends Item
  private final case class LinkPara(text: String, href: String, anchor: String) extends Item

  private def sentence(seed: Long, tag: String, lang: String, unique: String): String = {
    val ws = langWords(lang)
    val sb = new StringBuilder
    val len = 6 + rndInt(seed, s"$tag/len", 5)
    for (k <- 0 until len) {
      if (k > 0) sb.append(' ')
      if (k == len / 2 && unique.nonEmpty) sb.append(unique)
      else sb.append(ws(rndInt(seed, s"$tag/w$k", ws.size)))
    }
    sb.toString
  }

  private def buildPage(spec: Spec, i: Int, j: Int, n: Int): (SyntheticPage, PageExpectation) = {
    val seed = spec.seed
    val host = hostNameOf(spec, i)
    val url = pageUrlOf(spec, i, j)
    val lang = hostLang(seed, i)
    val title = s"Page $j of $host"

    val items = ArrayBuffer.empty[Item]

    // host-wide boilerplate navigation menu (duplicate text across pages → D3)
    val navTargets = (0 until math.min(4, n)).toVector
    items += ListBlock(
      navTargets.map(t => s"Go to page $t"),
      nav = true,
      navTargets.map(t => s"/p$t.html"))

    // body content
    val nItems = 3 + rndInt(seed, s"items/$i/$j", 4)
    for (k <- 0 until nItems) {
      val kind = rndInt(seed, s"kind/$i/$j/$k", 6)
      kind match {
        case 0 =>
          items += Heading(2 + rndInt(seed, s"hl/$i/$j/$k", 2),
            s"Heading $k ${sentence(seed, s"h/$i/$j/$k", lang, "")}")
        case 1 | 2 =>
          items += Para(sentence(seed, s"p/$i/$j/$k", lang, s"tok${i}_${j}_$k"))
        case 3 =>
          items += ListBlock(
            (0 until 3).map(m => sentence(seed, s"li/$i/$j/$k/$m", lang, s"item${i}_${j}_${k}_$m")).toVector,
            nav = false, Vector.empty)
        case 4 =>
          items += TableBlock(Vector(
            Vector(s"h${k}a", s"h${k}b"),
            Vector(sentence(seed, s"tc/$i/$j/$k/0", lang, ""), s"v${i}_${j}_$k")))
        case 5 =>
          items += ImgPara(
            sentence(seed, s"ib/$i/$j/$k", lang, ""),
            s"logo $k", s"/img/$k.png",
            sentence(seed, s"ia/$i/$j/$k", lang, s"cap${i}_${j}_$k"))
      }
    }

    // shared footer boilerplate (same text on every page of the host)
    items += Para(s"Copyright $host all rights reserved")

    // links: forward fan-out within host, one cross-host, one disallowed,
    // one duplicate, one nofollow, one fragment variant
    val linkItems = ArrayBuffer.empty[Item]
    if (spec.treeLinks) {
      for (f <- 1 to spec.fanout) {
        val t = j * spec.fanout + f
        if (t < n) linkItems += LinkPara("", s"/p$t.html", s"link $t")
      }
      // host-spanning: every root page links to every other host root, so a
      // Domain-scope crawl under sharedDomain covers all hosts in one wave
      if (j == 0 && spec.sharedDomain) {
        for (o <- 0 until spec.hosts if o != i) {
          linkItems += LinkPara("", s"https://${hostNameOf(spec, o)}/p0.html", s"host $o")
        }
      }
    } else {
      val fanout = 1 + rndInt(seed, s"fan/$i/$j", spec.fanout)
      for (f <- 1 to fanout) {
        val t = (j + f) % n
        linkItems += LinkPara(sentence(seed, s"lp/$i/$j/$f", lang, ""), s"/p$t.html", s"link $t")
      }
    }
    linkItems += LinkPara("", s"/p${(j + 1) % n}.html#frag", "dup with fragment")
    if (j % 5 == 1) linkItems += LinkPara("", s"/private/secret${(j % 7) + 1}.html", "secret")
    if (j % 11 == 5) linkItems += LinkPara("", s"/r$j.html", "redirect hop")
    if (j % 4 == 2 && spec.hosts > 1 && !spec.sharedDomain)
      linkItems += LinkPara("", s"https://${hostName((i + 1) % spec.hosts)}/p0.html", "other site")
    if (j % 6 == 3) linkItems += LinkPara("", s"/missing$j.html", "dead link")
    items ++= linkItems

    val (html, spans, hrefs) = render(title, items.toVector)
    (SyntheticPage(url, host, 200, "text/html", null, html),
      PageExpectation(title, spans, hrefs))
  }

  /** Render model → (html, expected spans, raw hrefs in document order).
    * The expected spans replicate the converter contract exactly (see
    * HtmlToSpans): flat sibling headings under <body> nest by level, lists
    * carry per-item text blocks, table cells carry coordinate payloads,
    * images emit Media.Image spans before their enclosing block's text.
    */
  private def render(title: String, items: Vector[Item]): (String, Vector[Span], Vector[String]) = {
    val html = new StringBuilder
    val spans = Vector.newBuilder[Span]
    var off = 0
    def emit(kind: String, text: String, media: String = ""): Unit = {
      spans += Span(kind, text, media, off); off += 1
    }
    val hrefs = Vector.newBuilder[String]
    var headingLevels = List.empty[Int]

    html.append("<html><head><title>").append(title).append("</title></head><body>")

    items.foreach {
      case Heading(level, text) =>
        while (headingLevels.nonEmpty && level <= headingLevels.head) {
          emit("Section.End", ""); headingLevels = headingLevels.tail
        }
        html.append(s"<h$level>").append(text).append(s"</h$level>")
        emit("Section.Start", text)
        headingLevels = level :: headingLevels
      case Para(text) =>
        html.append("<p>").append(text).append("</p>")
        emit(SpanKinds.TextBlockText, text)
      case ImgPara(before, alt, src, after) =>
        html.append("<p>").append(before)
          .append(s"""<img src="$src" alt="$alt">""").append(after).append("</p>")
        emit(SpanKinds.MediaImage, alt, src)
        emit(SpanKinds.TextBlockText, s"$before $alt $after")
      case ListBlock(texts, nav, linkHrefs) =>
        val tpe = if (nav) "NavigationList" else "List"
        html.append("<ul>")
        emit(s"$tpe.Start", "")
        texts.zipWithIndex.foreach { case (t, m) =>
          if (nav) {
            val href = linkHrefs(m)
            html.append(s"""<li><a href="$href">""").append(t).append("</a></li>")
            hrefs += href
          } else {
            html.append("<li>").append(t).append("</li>")
          }
          emit("ListItem.Start", "")
          emit(SpanKinds.TextBlockText, t)
          emit("ListItem.End", "")
        }
        html.append("</ul>")
        emit(s"$tpe.End", "")
      case TableBlock(rows) =>
        html.append("<table>")
        emit("Table.Start", "")
        rows.zipWithIndex.foreach { case (cells, r) =>
          html.append("<tr>")
          cells.zipWithIndex.foreach { case (c, cIdx) =>
            val isHeader = r == 0
            val tag = if (isHeader) "th" else "td"
            html.append(s"<$tag>").append(c).append(s"</$tag>")
            val tpe = if (isHeader) "TableHeader" else "TableCell"
            emit(s"$tpe.Start", s"${r + 1},${cIdx + 1}")
            emit(SpanKinds.TextBlockText, c)
            emit(s"$tpe.End", "")
          }
          html.append("</tr>")
        }
        html.append("</table>")
        emit("Table.End", "")
      case LinkPara(text, href, anchor) =>
        html.append("<p>")
        val full = if (text.nonEmpty) s"$text $anchor" else anchor
        if (text.nonEmpty) html.append(text)
        html.append(s"""<a href="$href">""").append(anchor).append("</a></p>")
        hrefs += href
        emit(SpanKinds.TextBlockText, full)
    }

    while (headingLevels.nonEmpty) { emit("Section.End", ""); headingLevels = headingLevels.tail }
    html.append("</body></html>")
    (html.toString, spans.result(), hrefs.result())
  }
}
