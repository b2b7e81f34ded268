package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures recall@k vs brute force for the ANN family at a given SF dir —
  * the quantitative side of BASELINE.md's equal-recall comparison between
  * `q_pq_topk` and `q_ivfpq_topk`. Prints one JSON line.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    def recall(s: Set[(Long, Long)]): Double =
      exact.intersect(s).size.toDouble / exact.size
    val pq = recall(pairs(Similarity.pqTopK(emb, queries,
      "vec_id", "embedding", k = 5, m = 8, ksub = 16, rerank = 128)))
    val ivfpq = recall(pairs(Similarity.ivfPqTopK(emb, queries,
      "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4, m = 8, ksub = 16,
      iterations = 2, rerank = 128)))
    val ivfpq64 = recall(pairs(Similarity.ivfPqTopK(emb, queries,
      "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4, m = 8, ksub = 16,
      iterations = 2, rerank = 64)))
    println(s"""{"recall_at_5":{"pq_rerank128":$pq,"ivfpq_np4_rerank128":$ivfpq,"ivfpq_np4_rerank64":$ivfpq64},"sf":"$sfDir"}""")
    spark.stop()
  }
}
