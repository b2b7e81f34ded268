package graft.crawl

import graft.core.{RobotsTxt, ScopeFilter, Span}

/** One frontier row — Spark mapping of the reference's `PageToCrawl`
  * (`Abot/Poco/PageToCrawl.cs:8-91`). `seq` is the deterministic global FIFO
  * discovery sequence (the contract that replaces queue arrival order),
  * `wave` the BFS wave the entry is scheduled for.
  */
final case class FrontierEntry(
    url: String,
    url_hash: Long,
    host: String,
    parent_url: String,
    depth: Int,
    seq: Long,
    wave: Int)

/** Synthetic fetch universe row (FIXTURES.md §2). */
final case class SyntheticPage(
    url: String,
    host: String,
    status: Int,
    content_type: String,
    redirect_to: String, // nullable
    html: String)

/** Raw fetch result rows — the output of the host-bucketed, politeness-
  * paced fetch stage, BEFORE extraction. Bodies are shuffled to a salted
  * even partitioning for the CPU-bound extract stage (hot-host skew applies
  * to fetch pacing, never to parsing — SURVEY.md §4).
  */
final case class FetchedPage(
    url: String,
    url_hash: Long,
    host: String,
    seq: Long,
    depth: Int,
    wave: Int,
    status: Int,
    content_type: String,
    redirect_to: String,
    body: String,
    fetch_ms: Double)

/** Result of fetching+extracting one page inside the fetch mapPartitions. */
final case class PageResult(
    url: String,
    url_hash: Long,
    host: String,
    seq: Long,
    depth: Int,
    wave: Int,
    status: Int,
    content_type: String,
    title: String,
    spans: Seq[Span],
    out_links: Seq[String], // canonical, in-page-deduped, document order
    no_follow: Boolean,
    fetch_ms: Double,
    extract_ms: Double,
    partition_id: Int,
    total_words: Long, // per-doc local aggregate (A4) — no shuffle needed
    lang: String,      // per-doc argmax language (A3) — local fold
    is_error: Boolean) // F9 classification: non-200 except followable 3xx

/** One extracted document row — the north-rule table shape
  * (doc_id, spans) plus analysis metadata.
  */
final case class DocumentRow(
    doc_id: String,
    spans: Seq[Span],
    title: String,
    lang: String,
    total_words: Long,
    unique_words: Long,
    wave: Int,
    seq: Long)

/** Per-partition crawl lineage + metrics row (north rule). */
final case class MetricsRow(
    wave: Int,
    partition_id: Int,
    pages: Long,
    errors: Long,
    words: Long,
    fetch_ms: Double,
    extract_ms: Double)

/** Per-host state (robots rules + politeness), persisted per wave. */
final case class HostState(
    host: String,
    crawl_delay_ms: Long,
    robots_txt: String, // raw content; "" when absent
    discovered_wave: Int)

final case class CrawlConfig(
    rootUrl: String,
    scope: ScopeFilter.Scope = ScopeFilter.SubDomain,
    userAgent: String = "graftbot",
    maxDepth: Int = 1000,
    maxLinksPerPage: Int = 1000,
    maxPagesToCrawl: Long = 0L, // 0 = unlimited (CrawlDecisionMaker.cs:56-63)
    maxPagesPerDomain: Long = 0L, // 0 = unlimited (CrawlDecisionMaker.cs:64-71)
    maxErrors: Long = 0L, // 0 = unlimited (maxErrorsCount default 10 in ref)
    minUniquePct: Double = 0.0, // 0 = off; reference minUniqueText=5 (%)
    minCrawlDelayMs: Long = 100L,
    maxRobotsDelaySec: Int = 5, // robots crawl-delay clamp (PoliteWebCrawler.cs:103-115)
    waveBudgetMs: Long = 60000L, // politeness budget per host per wave
    maxWaves: Int = 100,
    // Bloom negative-cache in front of the exact seen anti-join (the exact
    // set stays authoritative; reference sizing 2,000,001 @ 0.1% FPR,
    // Abot/Core/BloomFilterCrawledUrlRepository.cs:19). 0 disables.
    bloomCapacity: Long = 2000001L,
    bloomFpr: Double = 0.001,
    // request-log table (S9 analog of the reference's 13-column request log,
    // WebsiteTextExtractor.cs:415-474); off in benchmarks
    logFetches: Boolean = true,
    // bench-only knob: fixed busy-work per extracted page, standing in for
    // the parse cost of realistically-sized pages (synthetic fixtures are
    // tiny); 0 in all correctness paths
    simulatedExtractCostNanos: Long = 0L) {

  /** Effective per-host delay: max(minCrawlDelay, clamp(robots delay, 5s)) —
    * `DomainRateLimiter.cs:42-66` + `PoliteWebCrawler.cs:103-115`.
    */
  def effectiveDelayMs(robotsDelaySec: Int): Long = {
    val clamped = math.min(robotsDelaySec, maxRobotsDelaySec).toLong * 1000L
    math.max(minCrawlDelayMs, clamped)
  }

  /** Per-host pages-per-wave cap from the politeness budget — a hot host is
    * serialized by its crawl delay by definition, so it may contribute at
    * most budget/delay fetches per wave; the rest carries over. This is the
    * scheduling-level skew control from SURVEY.md §4.
    */
  def maxPagesPerHostPerWave(robotsDelaySec: Int): Int =
    math.max(1L, waveBudgetMs / effectiveDelayMs(robotsDelaySec)).toInt
}

/** Compiled robots state shared by engine and oracle. */
final case class CompiledRobots(parsed: RobotsTxt.Parsed) {
  def allowed(pathAndQuery: String, ua: String): Boolean = parsed.allowed(pathAndQuery, ua)
  def crawlDelaySec(ua: String): Int = parsed.crawlDelaySec(ua)
}

object CompiledRobots {
  val Empty: CompiledRobots = CompiledRobots(RobotsTxt.Empty)
  def of(content: String): CompiledRobots =
    if (content == null || content.isEmpty) Empty else CompiledRobots(RobotsTxt.parse(content))
}
