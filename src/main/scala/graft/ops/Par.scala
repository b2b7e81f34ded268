package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism shim for CPU-heavy per-row kernels (optimization guide §1.2
  * "per-task work", §2.5 input skew / §6 input split size): a narrow input
  * — locally, a single-row-group parquet file scans as ONE task no matter
  * how many cores the session has — serializes an expensive kernel
  * (codec encode/decode, hashing UDFs, shingle explosion) on one core
  * while the rest of the cluster idles.
  *
  * [[spread]] round-robins the rows across `defaultParallelism` partitions
  * before such a kernel. It is a NO-OP whenever the input is already at
  * least that wide — the 100-TB case, where scans arrive with thousands of
  * splits — so no shuffle is ever added at scale; locally it trades one
  * tiny shuffle (the narrow input, by definition, is small) for full-width
  * execution of the kernel stage. The target is derived from the session
  * (`sparkContext.defaultParallelism`), never a constant.
  *
  * Deliberately NOT used where per-partition layout or arrival order is
  * semantic: sequence packing routes by id hash, seq assignment sorts,
  * k-means training folds partials in partition order.
  */
object Par {

  /** Ensure at least defaultParallelism partitions (no-op when already
    * wider). Row order is not preserved — callers must be order-free.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
