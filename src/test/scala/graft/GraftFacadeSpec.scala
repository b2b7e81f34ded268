package graft

import graft.core.ScopeFilter
import graft.crawl._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class GraftFacadeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-facade-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("crawl → documents → export → render, end to end through the facade") {
    val site = SyntheticWeb.generate(
      SyntheticWeb.Spec(hosts = 1, pagesPerHost = 8, hotHostFactor = 1))
    val wh = Files.createTempDirectory("graft-facade").toString
    val config = CrawlConfig(rootUrl = site.rootUrl, scope = ScopeFilter.Domain)
    val fetcher = new SyntheticFetcher(site.pages, site.robots)

    val r = Graft.crawl(spark, config, fetcher, wh, numPartitions = 4)
    assert(r.pagesCrawled > 0 && r.wavesProcessed > 0)
    assert(r.stopReason.isEmpty)

    val docs = Graft.documentsTyped(spark, wh).collect()
    assert(docs.nonEmpty)
    val md = Graft.toMarkdown(docs.head)
    assert(md.nonEmpty && md.contains("#"))
    val csv = Graft.toCsvDataframe(docs.head)
    assert(csv.startsWith("DocEltType;"))

    // resume is a no-op on a finished crawl
    val r2 = Graft.crawl(spark, config, fetcher, wh, numPartitions = 4)
    assert(r2.wavesProcessed == 0 && r2.pagesCrawled == r.pagesCrawled)

    // restart wipes and re-crawls to the same result
    val r3 = Graft.restart(spark, config, fetcher, wh, numPartitions = 4)
    assert(r3.pagesCrawled == r.pagesCrawled)

    // config round-trips through the warehouse; continueCrawl resumes from
    // the PERSISTED config (caller supplies only overrides)
    assert(Graft.persistedConfig(spark, wh).contains(config))
    val r4 = Graft.continueCrawl(spark, fetcher, wh,
      overrides = c => c.copy(maxPagesToCrawl = 1000L), numPartitions = 4)
    assert(r4.wavesProcessed == 0 && r4.pagesCrawled == r.pagesCrawled)
    assert(Graft.persistedConfig(spark, wh).exists(_.maxPagesToCrawl == 1000L))

    // export (gate below corpus size so something passes)
    val out = Files.createTempDirectory("graft-facade-out").toString
    Graft.exportDataset(Graft.documents(spark, wh), out, minDocsPerSite = 1)
    // README.md sits at the dataset root (HF layout) — filter to parquet
    // when reading the whole root back with Spark
    assert(spark.read.option("pathGlobFilter", "*.parquet")
      .parquet(out).count() == docs.length)
    // dataset card written alongside the parquet
    val card = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/README.md")), "UTF-8")
    assert(card.startsWith("---") && card.contains("num_examples:")
      && card.contains("| Website |"))

    // per-doc renderings (S5): markdown + preview.html + csv, D4-pruned
    val rendered = Graft.renderAll(spark, wh).collect()
    assert(rendered.length == docs.length)
    assert(rendered.forall(r =>
      r.getAs[String]("preview_html").startsWith("<!doctype html>")))
    assert(rendered.forall(r =>
      r.getAs[String]("csv").startsWith("DocEltType;")))

    // lineage surfaces — A1 contract: per-partition words is the real
    // sum of fetched pages' total_words (documents only keep unique-text
    // survivors, so metrics words >= documents' total_words sum > 0)
    assert(Graft.metrics(spark, wh).count() > 0)
    val metricsWords = Graft.metrics(spark, wh)
      .agg(org.apache.spark.sql.functions.sum("words")).head().getLong(0)
    val docWords = Graft.documents(spark, wh)
      .agg(org.apache.spark.sql.functions.sum("total_words")).head().getLong(0)
    assert(metricsWords > 0 && metricsWords >= docWords,
      s"metrics words $metricsWords vs doc words $docWords")
    assert(Graft.seenHashes(spark, wh).count() >= r.pagesCrawled)
    assert(Graft.hostStates(spark, wh).count() == 1)
    // request log (S9): one row per fetched page, 15 columns
    val log = Graft.fetchLog(spark, wh)
    assert(log.count() == r.pagesCrawled)
    assert(log.columns.length == 15 && log.columns.contains("fetch_ms")
      && log.columns.contains("retry_count"))

    // per-document file-tree export (C8): three files per doc under the
    // reference's URL-derived layout, written partition-parallel
    val treeOut = Files.createTempDirectory("graft-facade-tree").toString
    val contentDir = Graft.exportFiles(spark, wh, treeOut)
    assert(contentDir.startsWith(treeOut))
    val written = java.nio.file.Files.walk(java.nio.file.Paths.get(contentDir))
      .filter(java.nio.file.Files.isRegularFile(_))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(written)
      .asScala.map(_.toString).toVector
    assert(names.count(_.endsWith(".text.md")) == docs.length)
    assert(names.count(_.endsWith(".dataframe.csv")) == docs.length)
    assert(names.count(_.endsWith(".preview.html")) == docs.length)
    // language extension sits between the url-derived base and the format
    assert(names.forall(n => n.contains(".xx.") ||
      n.matches(".*\\.[a-z]{2}\\.(text\\.md|dataframe\\.csv|preview\\.html)")))
    // BOM-prefixed UTF-8 like the reference writer (UTF8Encoding(true))
    val firstBytes = Files.readAllBytes(
      java.nio.file.Paths.get(names.head)).take(3)
    assert(firstBytes.sameElements(
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)))
  }

  test("URL→path mapping matches the reference's documented layout") {
    import graft.extract.FileExport
    // GetBaseDomain doc example (HtmlFileUtils.cs:36-38)
    assert(FileExport.websitePath(ScopeFilter.Domain,
      "http://www.west-wind.com/") == "west-wind.com")
    assert(FileExport.websitePath(ScopeFilter.SubDomain,
      "http://www.west-wind.com/") == "www.west-wind.com")
    // segments + filename
    assert(FileExport.filePathFromUrl(
      "https://en.wikipedia.org/wiki/Text_mining") == "wiki/Text_mining")
    assert(FileExport.filePathFromUrl(
      "https://site.com/docs/guide/intro.html") == "docs/guide/intro.html")
    // trailing slash → _default_
    assert(FileExport.filePathFromUrl("https://site.com/") == "_default_")
    assert(FileExport.filePathFromUrl("https://site.com/blog/") == "blog/_default_")
    // invalid filename chars → '_', url-decoding applied
    assert(FileExport.filePathFromUrl(
      "https://site.com/a%20b/c:d.html") == "a b/c_d.html")
    // query → '_' + uppercase MD5 of the query INCLUDING its leading '?'
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("?q=hello".getBytes("UTF-8")).map("%02X".format(_)).mkString
    assert(FileExport.filePathFromUrl(
      "https://site.com/search?q=hello") == s"search_$md5")
    // dots-before-slash collapse defangs traversal segments
    assert(!FileExport.pathValidChars("a/../b").contains(".."))
    // language extension
    assert(FileExport.languageCode("?") == "xx" && FileExport.languageCode("en") == "en")
  }
}
