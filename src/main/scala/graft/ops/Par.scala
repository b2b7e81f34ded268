package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism shim for CPU-heavy per-row kernels (optimization guide §1.2
  * "per-task work", §2.5 input skew / §6 input split size): a narrow input
  * — locally, a single-row-group parquet file scans as ONE populated task
  * no matter how many cores the session has — serializes an expensive
  * kernel (codec encode/decode, hashing UDFs, shingle explosion) on one
  * core while the rest of the cluster idles.
  *
  * [[spread]] round-robins the rows across `defaultParallelism` partitions
  * before such a kernel, deciding from FILE METADATA only (file count,
  * parquet footer row-group counts — driver-side reads bounded by the
  * core count, no Spark job, no plan materialization):
  *
  *  - `>= defaultParallelism` input files → no-op. The 100-TB case: scans
  *    arrive thousands of files wide, so no shuffle is ever added at
  *    scale, and the decision costs one logical-plan walk.
  *  - fewer files → populated scan partitions are bounded by total ROW
  *    GROUPS, not byte-range splits (parquet assigns a row group to the
  *    one split holding its midpoint — extra splits of a few-row-group
  *    file are EMPTY, which is why a partition-count gate would wrongly
  *    no-op here). If the footers show at least core-count row groups the
  *    scan parallelizes naturally; otherwise repartition.
  *  - non-file inputs (in-memory test frames, mid-pipeline frames) →
  *    no-op: their parallelism was set by whatever produced them, and
  *    probing a mid-pipeline frame's physical layout would force AQE to
  *    plan-and-execute upstream stages just to read a number.
  *
  * The target is derived from the session (`defaultParallelism`), never a
  * constant. Deliberately NOT used where per-partition layout or arrival
  * order is semantic: sequence packing routes by id hash, seq assignment
  * sorts, k-means training folds partials in partition order.
  */
object Par {

  /** Ensure a narrow file-backed input is at least defaultParallelism
    * partitions wide (no-op otherwise). Row order is not preserved —
    * callers must be order-free.
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) return df
    if (totalRowGroups(df, files, target) >= target) df
    else df.repartition(target)
  }

  /** Total parquet row groups across `files`, reading footers until
    * `enough` is reached (driver metadata IO, bounded by the file count —
    * only called when that count is below the core count). A file whose
    * footer cannot be read (non-parquet source, transient IO) counts as
    * ONE row group — the conservative choice that keeps few-file inputs
    * on the spread path.
    */
  private def totalRowGroups(df: DataFrame, files: Array[String],
      enough: Int): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    var total = 0L
    var i = 0
    while (i < files.length && total < enough) {
      total += (try {
        val path = new org.apache.hadoop.fs.Path(files(i))
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRowGroups.size.toLong finally r.close()
      } catch { case _: Exception => 1L })
      i += 1
    }
    total
  }
}
