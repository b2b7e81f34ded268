package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for a list of queries to individual files —
  * the per-round optimization evidence (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.DumpPlansTo <outDir> <suffix> <q1,q2,...> [sfDir]
  * writes <outDir>/<query>_<suffix>.txt for each query.
  */
object DumpPlansTo {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plans-to")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        formatted.trim.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
