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

  /** Write the dataset, hive-partitioned by website and split. */
  def write(docs: DataFrame, idCol: String, outDir: String,
      langFilter: Option[String] = None, minDocs: Long = 50L): Unit =
    prepare(docs, idCol, langFilter, minDocs)
      .write.mode("overwrite")
      .partitionBy("website", "split")
      .parquet(outDir)
}
