package graft.tools

import org.apache.spark.sql.SparkSession

/** Crawl-bench-only entry for profiling (use with GRAFT_TRACE=1). */
object BenchCrawlOnly {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-crawl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (sec, pages, waves, io) = graft.Bench.crawlBenchIo(spark, cpus)
    println(s"""{"crawl_sec":$sec,"pages":$pages,"waves":$waves,"pps":${pages / sec}}""")
    // per-partition lineage: where did the time actually go?
    io.readAll("metrics", graft.crawl.TableIO.MetricsSchema)
      .groupBy("wave")
      .agg(org.apache.spark.sql.functions.sum("pages").as("pages"),
        org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.sum("extract_ms") / 1000, 1).as("extract_s_total"),
        org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.max("extract_ms") / 1000, 1).as("extract_s_maxpart"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("parts"))
      .orderBy("wave").show(50, false)
    spark.stop()
  }
}
