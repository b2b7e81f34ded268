package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time a single SparkEntry query (default sf0.1, local[32]).
  * Usage: runMain graft.tools.BenchOne <queryName> [sfDir] [cpus]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // warm the session on a trivial job so JVM/session startup is excluded
    spark.range(1000).count()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"query":"$name","sec":$sec%.3f,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
