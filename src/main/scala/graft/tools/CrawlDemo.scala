package graft.tools

import graft.crawl._
import org.apache.spark.sql.SparkSession

/** CLI demo/verification entry: crawl a seeded synthetic web end-to-end via
  * the Spark engine, print the resulting tables, and compare against the
  * sequential oracle. Usage:
  *   sbt "runMain graft.tools.CrawlDemo [warehouseDir] [hosts] [pagesPerHost]"
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-crawl").toString)
    val hosts = if (args.length > 1) args(1).toInt else 3
    val pagesPerHost = if (args.length > 2) args(2).toInt else 8

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-crawl-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val site = SyntheticWeb.generate(SyntheticWeb.Spec(hosts = hosts, pagesPerHost = pagesPerHost))
    val config = CrawlConfig(rootUrl = site.rootUrl, scope = graft.core.ScopeFilter.Domain)
    val fetcher = new SyntheticFetcher(site.pages, site.robots)
    val io = new TableIO(warehouse, spark)
    val engine = new CrawlEngine(spark, io, config, fetcher, numPartitions = 8)

    val t0 = System.nanoTime()
    val waves = engine.run()
    val secs = (System.nanoTime() - t0) / 1e9

    val docs = io.readAll("documents", TableIO.DocumentsSchema)
    val seen = io.readAll("seen", TableIO.SeenSchema, lookahead = 1)
    val metrics = io.readAll("metrics", TableIO.MetricsSchema)

    println(s"=== engine: $waves waves in ${"%.1f".format(secs)}s → $warehouse")
    println(s"documents: ${docs.count()}  seen: ${seen.count()}")
    docs.select("doc_id", "lang", "total_words", "unique_words", "wave", "seq")
      .orderBy("seq").show(10, truncate = false)
    metrics.orderBy("wave", "partition_id").show(10)

    // oracle comparison
    val oracle = SequentialOracle.crawl(site, config)
    val engineSeen = seen.collect().map(_.getLong(0)).toSet
    val engineDocs = docs.orderBy("seq").collect()
    println(s"oracle: docs=${oracle.documents.size} seen=${oracle.seen.size} " +
      s"order=${oracle.crawlOrder.size}")
    println(s"seen match: ${engineSeen == oracle.seen}")
    println(s"doc count match: ${engineDocs.length == oracle.documents.size}")
    val docIdsMatch = engineDocs.map(_.getString(0)).toVector == oracle.documents.map(_.doc_id)
    println(s"doc order match: $docIdsMatch")
    spark.stop()
  }
}
