package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-shaped smoke: `SparkEntry.entry(spark)` must yield rows — the
  * exact check the round driver runs against the flagship query.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-entry-smoke")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"""{"entry_rows":$n}""")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
