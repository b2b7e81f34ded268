package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Final-dataset export — the Spark re-expression of the reference's
  * `dataset` entry point (`parquet/HuggingFaceDatasetBuilder.cs:14-54`,
  * SURVEY.md §3.3): one honest batch query over the documents table.
  *
  *  - optional language filter;
  *  - per-website minimum-document gate (≥ minDocs, reference uses 50 via
  *    its language histogram, `HuggingFaceDatasetBuilder.cs:32-35`);
  *  - DETERMINISTIC 80/10/10 split by hashed doc id — the seeded
  *    replacement for the reference's unseeded Fisher-Yates shuffle
  *    (`:427-440`), documented deviation per SURVEY.md "hard parts";
  *  - written `partitionBy(website, split)` (the reference writes one
  *    parquet file per website×split, `:289-302`).
  */
object DatasetExport {

  /** Prepare the export frame (no I/O): adds website + split, applies the
    * language filter and the per-website gate.
    */
  def prepare(docs: DataFrame, idCol: String, langFilter: Option[String],
      minDocs: Long = 50L): DataFrame = {
    val withSite = docs.withColumn("website",
      regexp_extract(col(idCol), "^https?://([^/]+)/", 1))
    val filtered = langFilter match {
      case Some(l) => withSite.filter(col("lang") === l)
      case None => withSite
    }
    val counts = filtered.groupBy(col("website"))
      .agg(count(lit(1)).as("site_docs"))
      .filter(col("site_docs") >= minDocs)
    filtered
      .join(broadcast(counts.select("website")), Seq("website"), "left_semi")
      .withColumn("split", TextOps.splitAssign(col(idCol)))
  }

  /** Write the dataset, hive-partitioned by website and split, plus the
    * dataset-card README.md generated from the export aggregates
    * (`parquet/HuggingFaceDatasetBuilder.cs:81-287`). The card lives at the
    * dataset root (HF layout); Spark readers of the root should use
    * `.option("pathGlobFilter", "*.parquet")`.
    */
  def write(docs: DataFrame, idCol: String, outDir: String,
      langFilter: Option[String] = None, minDocs: Long = 50L,
      prettyName: String = "graft dataset"): Unit = {
    val prepared = prepare(docs, idCol, langFilter, minDocs)
    // zstd for the EXPORT only: the published dataset is written once and
    // read many times, so the better ratio wins at 100 TB; the per-wave
    // crawl-state tables stay on parquet's default snappy, where write
    // latency sits on the wave critical path
    prepared.write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy("website", "split")
      .parquet(outDir)
    // card size + write through the Hadoop FS of the output path, so the
    // export works on hdfs://-style destinations too (driver-side IO)
    val conf = docs.sparkSession.sparkContext.hadoopConfiguration
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    // private instance: checksum-off must not leak into the JVM-wide
    // cached FileSystem that Spark writes through
    val fs = org.apache.hadoop.fs.FileSystem.newInstance(
      outPath.getFileSystem(conf).makeQualified(outPath).toUri, conf)
    try {
      val size = fs.getContentSummary(fs.makeQualified(outPath)).getLength
      val card = datasetCard(prepared, prettyName, langFilter.getOrElse("multi"), size)
      fs.setWriteChecksum(false)
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$outDir/README.md"), true)
      try out.write(card.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } finally fs.close()
  }

  /** HF size_categories bucket (`HuggingFaceDatasetBuilder.cs:84-112`). */
  def sizeCategory(totalExamples: Long): String =
    if (totalExamples > 1_000_000_000L) "1B<n<10B"
    else if (totalExamples > 100_000_000L) "100M<n<1B"
    else if (totalExamples > 10_000_000L) "10M<n<100M"
    else if (totalExamples > 1_000_000L) "1M<n<10M"
    else if (totalExamples > 100_000L) "100K<n<1M"
    else if (totalExamples > 10_000L) "10K<n<100K"
    else if (totalExamples > 1_000L) "1K<n<10K"
    else "n<1K"

  /** Dataset-card markdown from a prepared frame: YAML front matter (size
    * category, splits with example counts, feature schema, download size)
    * + a per-website stats table — the structure of the reference's
    * GenerateDatasetCard with OUR schema's features. Aggregates are one
    * tiny groupBy each (rows = splits / websites), safe to collect.
    */
  def datasetCard(prepared: DataFrame, prettyName: String,
      language: String, downloadSize: Long): String = {
    val splitCounts = prepared.groupBy(col("split"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hasWords = prepared.columns.contains("total_words")
    val wordsCol = if (hasWords) sum(col("total_words")) else sum(lit(0L))
    val sites = prepared.groupBy(col("website"))
      .agg(count(lit(1)).as("docs"), wordsCol.as("words"))
      .orderBy(col("website")).collect()
    val total = splitCounts.values.sum
    val features = prepared.schema.fields
      .map(f => s"    - name: ${f.name}\n      dtype: ${f.dataType.simpleString}")
      .mkString("\n")
    val siteRows = sites.map(r =>
      s"| ${r.getString(0)} | ${r.getLong(1)} | ${r.getLong(2)} |").mkString("\n")
    s"""---
       |pretty_name: "$prettyName"
       |tags:
       |- graft-webscraper
       |task_categories:
       |- text-generation
       |task_ids:
       |- language-modeling
       |size_categories: ${sizeCategory(total)}
       |language: $language
       |license: apache-2.0
       |source_datasets: original
       |language_creators: found
       |annotations_creators: no-annotation
       |configs:
       |- config_name: default
       |  data_files:
       |  - split: train
       |    path: "website=*/split=train/*.parquet"
       |  - split: valid
       |    path: "website=*/split=valid/*.parquet"
       |  - split: test
       |    path: "website=*/split=test/*.parquet"
       |dataset_info:
       |  features:
       |$features
       |  config_name: default
       |  splits:
       |    - name: train
       |      num_examples: ${splitCounts.getOrElse("train", 0L)}
       |    - name: valid
       |      num_examples: ${splitCounts.getOrElse("valid", 0L)}
       |    - name: test
       |      num_examples: ${splitCounts.getOrElse("test", 0L)}
       |  download_size: $downloadSize
       |---
       |
       |# Dataset Card for "$prettyName"
       |
       |Dataset extracted from public websites by graft (a Spark-native
       |re-implementation of wordslab-webscraper's pipeline).
       |
       |## Websites
       |
       || Website | Documents | Words |
       ||---------|-----------|-------|
       |""".stripMargin + siteRows + "\n"
    // (site rows appended AFTER stripMargin: their leading '|' would
    // otherwise be eaten as a margin marker)
  }
}
