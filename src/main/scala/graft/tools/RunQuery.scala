package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one `SparkEntry.queries` entry and print its rows as TSV — the
  * quick way to eyeball a single query's output (Verify runs all of them
  * and writes parquet; this is the 10-second loop while iterating on one).
  *
  * Usage: runMain graft.tools.RunQuery <queryName> [sfDir] [maxRows]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val maxRows = if (args.length > 2) args(2).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-run-query")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.schema.fieldNames.mkString("\t"))
    df.take(maxRows).foreach(r =>
      println(r.toSeq.map(String.valueOf).mkString("\t")))
    spark.stop()
  }
}
