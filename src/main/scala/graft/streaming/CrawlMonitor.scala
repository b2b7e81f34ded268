package graft.streaming

import graft.crawl.TableIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Cumulative per-host fetch counters held in stream GroupState (top-level:
  * the state Encoder's generated code needs a public constructor).
  */
final case class HostCounts(pages: Long, errors: Long)

/** Live observation of a RUNNING crawl as Structured Streaming over the
  * warehouse tables (A1's PerfMonitor counters, re-expressed as streams —
  * the reference polls an in-process monitor,
  * `WebsiteTextExtractor.cs:640-700`; here the warehouse IS the wire
  * format, so a monitor can run in a DIFFERENT Spark application than the
  * crawl, or on a different machine over a shared filesystem).
  *
  * Wave commits append parquet files under `<warehouse>/<table>/wN/`;
  * the file-source stream picks each wave up as a micro-batch. Aggregates
  * run either stateless-windowed or with EXPLICIT per-key state
  * (`KeyValueGroupedDataset.mapGroupsWithState`) where the semantics need
  * crawl-lifetime accumulation.
  *
  * DELIVERY SEMANTICS: at-least-once across crash-resume boundaries. The
  * file source lists raw staged files, not the manifest's committed
  * window, so rows of a wave staged by a killed run and re-staged on
  * resume (different part-file names under the same `wN/`) can be
  * observed twice by a monitor that straddled the crash; in steady state
  * (stage→commit seconds apart, no crash) counts are exact, and
  * `ignoreMissingFiles` below keeps the overwrite window from killing
  * the query. Monitoring tolerates transient over-count; anything
  * needing the exact committed contract reads the BATCH surfaces
  * (`Graft.metrics` / `Graft.fetchLog` / `Graft.errorLog`), which
  * consult the manifest.
  */
object CrawlMonitor {

  /** Streaming view of the per-wave, per-partition metrics lineage. */
  def metricsStream(spark: SparkSession, warehouse: String): DataFrame =
    waveTableStream(spark, warehouse, "metrics", TableIO.MetricsSchema)

  /** Streaming view of the request log (one row per fetch; requires the
    * crawl to run with `logFetches = true`).
    */
  def fetchLogStream(spark: SparkSession, warehouse: String): DataFrame =
    waveTableStream(spark, warehouse, "fetch_log", TableIO.FetchLogSchema)

  private def waveTableStream(spark: SparkSession, warehouse: String,
      table: String, schemaDdl: String): DataFrame =
    spark.readStream
      .schema(schemaDdl)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      // a resumed wave overwrites its staged dir; listed-but-deleted part
      // files must skip, not kill the monitor (see delivery semantics)
      .option("ignoreMissingFiles", "true")
      .parquet(s"$warehouse/$table")

  /** Per-wave crawl throughput/health rollup — stateless aggregation,
    * run with outputMode("complete") (waves are few; the state is the
    * per-wave totals, bounded by wave count).
    */
  def waveThroughput(metrics: DataFrame): DataFrame =
    metrics.groupBy(col("wave"))
      .agg(sum(col("pages")).as("pages"),
        sum(col("errors")).as("errors"),
        sum(col("words")).as("words"),
        round(sum(col("pages")) * 1000.0 /
          greatest(max(col("fetch_ms")) + max(col("extract_ms")), lit(1.0)), 2)
          .as("pages_per_sec_est"))

  /** Crawl-lifetime health of one host, updated every micro-batch. */
  final case class HostHealth(
      host: String,
      pages: Long,
      errors: Long,
      error_rate: Double,
      flagged: Boolean)

  /** Per-host error-rate gate with EXPLICIT stream state: cumulative
    * (pages, errors) per host held in `GroupState` across micro-batches —
    * a host is flagged once it has `minPages` observations and its
    * crawl-lifetime error rate exceeds `maxErrorRate` (the streaming
    * analog of F4's retroactive auto-exclude, which batches decide per
    * wave). Emits the updated health row for every host seen in the
    * batch; run with outputMode("update").
    *
    * State is O(distinct hosts) — the same bound the batch engine's hosts
    * table carries; entries never expire because host health is
    * crawl-lifetime by definition (a crawl that needs expiry can wrap the
    * call with a watermark + timeout variant).
    */
  def hostHealth(fetchLog: DataFrame, minPages: Long = 10L,
      maxErrorRate: Double = 0.5): Dataset[HostHealth] = {
    val spark = fetchLog.sparkSession
    import spark.implicits._
    fetchLog.select(col("host"), col("is_error"))
      .as[(String, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[HostCounts, HostHealth](GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[(String, Boolean)],
         state: GroupState[HostCounts]) =>
          val prev = state.getOption.getOrElse(HostCounts(0L, 0L))
          var pages = prev.pages
          var errors = prev.errors
          rows.foreach { case (_, isError) =>
            pages += 1
            if (isError) errors += 1
          }
          state.update(HostCounts(pages, errors))
          val rate = if (pages == 0) 0.0 else errors.toDouble / pages
          HostHealth(host, pages, errors, rate,
            flagged = pages >= minPages && rate > maxErrorRate)
      }
  }
}
