package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}
import java.nio.charset.StandardCharsets

/** Wave-granular checkpointed table storage for crawl state.
  *
  * This is the Iceberg commit contract re-expressed over plain Parquet
  * (SURVEY.md §7: no Iceberg runtime jar ships in this environment): every
  * table is a directory of per-wave Parquet partitions (`w0`, `w1`, …), and
  * a partition is visible iff its wave index is within the committed window
  * recorded in `manifest.json`, which is replaced ATOMICALLY (tmp file +
  * ATOMIC_MOVE rename). A killed run therefore resumes exactly at the last
  * committed wave: partitions staged for an uncommitted wave are invisible
  * and are overwritten on retry (north rule: "a killed run resumes exactly").
  *
  * Tables staged one wave AHEAD (frontier for wave N+1, seen additions) are
  * read with `lookahead = 1`: they were staged before the commit of wave N,
  * so index committedWave+1 is already durable.
  *
  * If an Iceberg runtime is present, only this class changes: `commitWave`
  * becomes a multi-table snapshot commit, reads become snapshot reads.
  */
final class TableIO(val warehouse: String, spark: SparkSession) {
  import TableIO._

  private def waveDir(name: String, wave: Int) = s"$warehouse/$name/w$wave"
  private val manifestPath = s"$warehouse/manifest.json"

  // All driver-side warehouse IO goes through the Hadoop FileSystem
  // resolved from the warehouse path, so the same warehouse works on
  // file:// (local) and hdfs://; table reads/writes already do
  // (spark.read/df.write). The atomic-replace primitive is scheme-
  // dependent: java.nio ATOMIC_MOVE on the local filesystem (Hadoop's
  // FileContext.rename(OVERWRITE) falls back to delete-then-rename
  // there — a crash window that would lose the manifest), and
  // FileContext.rename(OVERWRITE) on HDFS, where the NameNode makes it
  // atomic. Object stores without atomic rename need a real commit
  // service (Iceberg et al.) — the class doc's substitution point.
  private val fs: FileSystem = new HPath(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)
  private val isLocalFs = fs.getScheme == "file"
  private lazy val fctx: FileContext = FileContext.getFileContext(
    fs.makeQualified(new HPath(warehouse)).toUri,
    spark.sparkContext.hadoopConfiguration)

  private def exists(path: String): Boolean = fs.exists(new HPath(path))

  private def readString(path: String): String = {
    val in = fs.open(new HPath(path))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** tmp-write + atomic rename-with-overwrite (see scheme note above). */
  private def atomicWrite(path: String, content: String): Unit = {
    if (isLocalFs) {
      val target = java.nio.file.Paths.get(
        fs.makeQualified(new HPath(path)).toUri.getPath)
      val tmp = java.nio.file.Paths.get(target.toString + ".tmp")
      java.nio.file.Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new HPath(path + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      fctx.rename(fs.makeQualified(tmp), fs.makeQualified(new HPath(path)),
        Options.Rename.OVERWRITE)
    }
  }

  fs.mkdirs(new HPath(warehouse))

  /** Last committed wave; -2 for a fresh warehouse (bootstrap commits -1). */
  def committedWave: Int = {
    if (!exists(manifestPath)) -2
    else {
      val txt = readString(manifestPath)
      """"committed_wave"\s*:\s*(-?\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toInt).getOrElse(-2)
    }
  }

  /** A long-valued stat persisted with the last commit (e.g. max_seq). */
  def stat(name: String): Option[Long] = {
    if (!exists(manifestPath)) None
    else {
      val txt = readString(manifestPath)
      (""""""" + name + """"\s*:\s*(-?\d+)""").r.findFirstMatchIn(txt).map(_.group(1).toLong)
    }
  }

  /** String-valued manifest field (e.g. stop_reason). */
  def statStr(name: String): Option[String] = {
    if (!exists(manifestPath)) None
    else {
      val txt = readString(manifestPath)
      ("\"" + name + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(txt).map(_.group(1))
    }
  }

  /** Stage one table's rows for wave index `wave` (NOT yet visible). */
  def stage[T](name: String, wave: Int, ds: Dataset[T]): Unit =
    ds.write.mode(SaveMode.Overwrite).parquet(waveDir(name, wave))

  /** Delete a staged wave partition. Needed by DATA-DEPENDENT staging: a
    * table staged only when rows exist (e.g. `errors`) can leave a stale
    * partition behind when a killed run staged it, the resumed wave
    * produces no rows, and the commit then makes the orphan visible —
    * the resumed wave must delete it instead. Driver-side fs call, no
    * Spark job. Refuses committed (visible) partitions.
    */
  def deleteStaged(name: String, wave: Int): Unit = {
    require(wave > committedWave, s"wave $wave is committed, not staged")
    val d = new HPath(waveDir(name, wave))
    if (fs.exists(d)) fs.delete(d, true)
  }

  /** Atomically commit `wave`, with lineage stats and an optional terminal
    * stop reason (a stopped crawl stays stopped across resumes).
    */
  def commitWave(wave: Int, stats: Map[String, Long] = Map.empty,
      stopReason: Option[String] = None): Unit = {
    val statsJson = stats.map { case (k, v) => s""","$k":$v""" }.mkString
    val stopJson = stopReason.map(r => s""","stop_reason":"$r"""").getOrElse("")
    val json = s"""{"committed_wave":$wave$statsJson$stopJson}"""
    atomicWrite(manifestPath, json)
  }

  /** Record a terminal stop reason against the CURRENT committed manifest
    * (same atomic replace as commitWave) — used when a stop is decided at
    * run()-exit rather than at a wave boundary (e.g. max_waves).
    */
  def setStopReason(reason: String): Unit = {
    val txt = readString(manifestPath)
    val stripped = txt.stripSuffix("}").replaceAll(""","stop_reason":"[^"]*"""", "")
    val json = stripped + s""","stop_reason":"$reason"}"""
    atomicWrite(manifestPath, json)
  }

  /** Union of all visible wave partitions of a table. */
  def readAll(name: String, schemaDdl: String, lookahead: Int = 0): DataFrame = {
    val maxWave = committedWave + lookahead
    val dirs = (0 to maxWave).map(w => waveDir(name, w))
      .filter(exists)
    if (dirs.isEmpty) emptyDf(spark, schemaDdl)
    else spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
      .parquet(dirs: _*)
  }

  /** Persisted crawl config (the reference's `_wordslab/config.txt`
    * round-trip, `WebsiteExtractorParams.cs:139-199`): written at
    * bootstrap, re-read on resume so callers can continue with overrides
    * instead of re-supplying an identical config.
    */
  private val configPath = s"$warehouse/config.json"

  def writeConfig(json: String): Unit = atomicWrite(configPath, json)

  def readConfig(): Option[String] =
    if (exists(configPath)) Some(readString(configPath)) else None

  /** Whether a wave partition exists on disk AND is visible. */
  def waveExists(name: String, wave: Int, lookahead: Int = 0): Boolean =
    wave <= committedWave + lookahead && exists(waveDir(name, wave))

  /** Rows of exactly one visible wave partition. */
  def readWave(name: String, wave: Int, schemaDdl: String, lookahead: Int = 0): DataFrame = {
    val d = waveDir(name, wave)
    if (wave > committedWave + lookahead || !exists(d)) emptyDf(spark, schemaDdl)
    else spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
      .parquet(d)
  }
}

object TableIO {
  val FrontierSchema =
    "url string, url_hash bigint, host string, parent_url string, depth int, " +
    "seq bigint, wave int, is_retry boolean, retry_count int, " +
    "retry_after_sec int, redirect_position int"
  val SeenSchema = "url_hash bigint"
  val UniqueBlocksSchema = "text_hash bigint, words int"
  val DocumentsSchema =
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, " +
    "title string, lang string, total_words bigint, unique_words bigint, wave int, seq bigint"
  val MetricsSchema =
    "wave int, partition_id int, pages bigint, errors bigint, words bigint, " +
    "fetch_ms double, extract_ms double"
  val HostsSchema = "host string, crawl_delay_ms bigint, robots_txt string, discovered_wave int"
  val ExcludesSchema = "pattern string, wave int"
  val Window10Schema = "url string, pct double, ord int"
  val HostCountsSchema = "host string, pages bigint"
  val BloomsSchema = "bucket int, num_bits bigint, num_hashes int, bits binary"
  val FetchLogSchema =
    "wave int, seq bigint, url string, host string, depth int, status int, " +
    "content_type string, no_follow boolean, is_error boolean, retry_count int, " +
    "n_links int, n_spans int, total_words bigint, fetch_ms double, " +
    "extract_ms double, css_ms double"
  val ErrorsSchema =
    "wave int, seq bigint, url string, host string, status int, " +
    "error_class string, error_message string, error_stack string, retry_count int"

  def emptyDf(spark: SparkSession, schemaDdl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
}
