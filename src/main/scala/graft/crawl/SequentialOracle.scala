package graft.crawl

import graft.core.{ScopeFilter, TextStats, UrlCanonicalizer}
import graft.extract.{DocAnalysis, HtmlToSpans, HtmlParser}
import scala.collection.mutable

/** Plain-Scala sequential reference crawler (FIXTURES.md §5): FIFO frontier
  * + AddIfNew seen-gate + scope/robots filters + per-host politeness caps +
  * first-wins text dedup, at the reference's single-logical-thread semantics
  * (`Abot/Core/Scheduler.cs:151-194`, `Abot/Crawler/WebCrawler.cs:955-999` at
  * MaxConcurrentThreads=1), expressed wave-synchronously.
  *
  * Its outputs — crawl order (seq→url per wave), final URL-seen set, and
  * per-document span sequences — are the expected values the Spark engine
  * must reproduce exactly.
  *
  * Deliberate, documented contract choices (shared with the engine):
  *  - redirects (3xx) are modeled as a single candidate link to the target
  *    (the reference follows them inside the HTTP request);
  *  - maxLinksPerPage caps *scheduled* links per page, but every candidate
  *    still becomes "known" (the reference `break`s out of the loop;
  *    fixtures keep fan-out below the cap so the paths agree);
  *  - crawl ordering is the deterministic wave/seq order (the reference is
  *    only deterministic at 1 thread — SURVEY.md §5.3).
  */
object SequentialOracle {

  final case class Result(
      crawlOrder: Vector[FrontierEntry], // in fetch order (wave asc, seq asc)
      seen: Set[Long],
      documents: Vector[DocumentRow],
      errors: Vector[String],
      uniqueBlocks: Map[Long, Int])

  def crawl(site: SyntheticWeb.Site, config: CrawlConfig): Result = {
    val rootCanon = UrlCanonicalizer.canonicalize(config.rootUrl).get
    val seen = mutable.Set[Long](UrlCanonicalizer.urlHash(rootCanon))
    val uniqueBlocks = mutable.LinkedHashMap.empty[Long, Int]
    val docs = Vector.newBuilder[DocumentRow]
    val order = Vector.newBuilder[FrontierEntry]
    val errors = Vector.newBuilder[String]
    val robotsCache = mutable.Map.empty[String, CompiledRobots]

    def robotsOf(host: String): CompiledRobots =
      robotsCache.getOrElseUpdate(host, CompiledRobots.of(site.robots.getOrElse(host, "")))

    var frontier = Vector(FrontierEntry(
      rootCanon, UrlCanonicalizer.urlHash(rootCanon), UrlCanonicalizer.host(rootCanon),
      "", 0, 0L, 0))
    var nextSeq = 1L
    var wave = 0

    while (frontier.nonEmpty && wave < config.maxWaves) {
      // politeness: per-host cap, fetch in seq order, rest carries over
      val byHost = frontier.groupBy(_.host)
      val due = mutable.ArrayBuffer.empty[FrontierEntry]
      val carry = mutable.ArrayBuffer.empty[FrontierEntry]
      byHost.foreach { case (host, entries) =>
        val cap = config.maxPagesPerHostPerWave(robotsOf(host).crawlDelaySec(config.userAgent))
        val sorted = entries.sortBy(_.seq)
        due ++= sorted.take(cap)
        carry ++= sorted.drop(cap).map(e => e.copy(wave = wave + 1))
      }
      val newFrontier = mutable.ArrayBuffer.empty[FrontierEntry]

      due.sortBy(_.seq).foreach { entry =>
        order += entry

        def scheduleCandidates(hrefs: Vector[String], baseUrl: String): Unit = {
          val inPage = mutable.Set.empty[String]
          var scheduled = 0
          hrefs.foreach { href =>
            UrlCanonicalizer.resolve(baseUrl, href).foreach { canon =>
              if (inPage.add(canon)) {
                val h = UrlCanonicalizer.urlHash(canon)
                if (!seen.contains(h)) {
                  val cHost = UrlCanonicalizer.host(canon)
                  val pass = entry.depth + 1 <= config.maxDepth &&
                    ScopeFilter.shouldCrawl(config.scope, canon, rootCanon) &&
                    robotsOf(cHost).allowed(UrlCanonicalizer.pathAndQuery(canon), config.userAgent) &&
                    scheduled < config.maxLinksPerPage
                  seen += h
                  if (pass) {
                    newFrontier += FrontierEntry(canon, h, cHost, entry.url,
                      entry.depth + 1, nextSeq, wave + 1)
                    nextSeq += 1
                    scheduled += 1
                  }
                }
              }
            }
          }
        }

        site.pages.get(entry.url) match {
          case None =>
            errors += s"404 ${entry.url}"
          case Some(page) if page.status >= 300 && page.status < 400 && page.redirect_to != null =>
            scheduleCandidates(Vector(page.redirect_to), entry.url)
          case Some(page) if page.status != 200 =>
            errors += s"${page.status} ${entry.url}"
          case Some(page) if page.content_type != "text/html" =>
            () // PDF path is stubbed: counted, no doc, no links
          case Some(page) =>
            val dom = HtmlParser.parse(page.html)
            val extracted = HtmlToSpans.extractDom(dom)
            // first-wins text-block dedup across the whole crawl (D3)
            val items = DocAnalysis.analyzableItems(extracted.spans)
            var totalWords = 0L
            var uniqueWords = 0L
            items.foreach { it =>
              totalWords += it.words
              if (!uniqueBlocks.contains(it.text_hash)) {
                uniqueBlocks(it.text_hash) = it.words
                uniqueWords += it.words
              }
            }
            if (uniqueWords > 0) {
              docs += DocumentRow(entry.url, extracted.spans, extracted.title,
                DocAnalysis.docLanguage(items), totalWords, uniqueWords, wave, entry.seq)
            }
            if (!extracted.noFollow) {
              val (rawHrefs, baseHref) = HtmlToSpans.rawLinks(dom)
              val baseUrl = baseHref match {
                case Some(b) if b.startsWith("//") =>
                  entry.url.takeWhile(_ != ':') + ":" + b
                case Some(b) => b
                case None => entry.url
              }
              scheduleCandidates(rawHrefs, baseUrl)
            }
        }
      }

      frontier = (carry ++ newFrontier).sortBy(_.seq).toVector
      wave += 1
    }

    Result(order.result(), seen.toSet, docs.result(), errors.result(), uniqueBlocks.toMap)
  }
}
