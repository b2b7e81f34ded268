package graft.crawl

import graft.core.{CuckooFilter64, UrlCanonicalizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Seen-set retraction ("forget") and recrawl re-seeding — the engine
  * extension that realizes the north rule's deletion clause: the URL-seen
  * set is a partitioned Bloom filter FALLING BACK TO CUCKOO FOR DELETIONS.
  *
  * The reference has no retraction operation (its seen set only grows,
  * `Abot/Core/InMemoryCrawledUrlRepository.cs`), but a long-lived 10^10-URL
  * crawl needs one: content-freshness recrawls of a site section, operator
  * removal requests, or undoing a section crawled by mistake. Two modes:
  *
  *  - **reseed = true (recrawl now)**: the target URLs are re-staged as
  *    ordinary frontier rows for the next wave and re-fetched under the
  *    exact same politeness machinery. Their hashes STAY in the seen set —
  *    the engine invariant is "in frontier ⊆ in seen" (a candidate's hash
  *    enters seen the moment it enters the frontier); retracting them would
  *    double-fetch any reseeded URL whose re-fetched parent re-emits the
  *    link as a candidate. Re-fetched pages emit a new document row only
  *    where content changed (the F10 unique-text gate applies unchanged).
  *  - **reseed = false (pure retraction)**: the hashes leave the seen set
  *    (and their filter buckets), so the URLs become crawlable again the
  *    next time the crawl discovers a link to them.
  *
  * `dropDocuments = true` additionally rewrites the documents table without
  * the targets' rows (an operator removal request) — the Iceberg
  * copy-on-write delete shape: expensive and rare by design. Operational
  * logs (fetch_log, errors) and the shared unique-text blocks are
  * deliberately untouched.
  *
  * Everything is distributed — joins and per-bucket cogroups keyed on
  * url_hash; the driver holds only scalar counts, the exclude-prefix list,
  * and the O(numPartitions) bucket-kind directory. Crash-atomicity reuses
  * the warehouse's manifest contract ([[TableIO.stageGeneration]] /
  * [[TableIO.mergeStats]]): all replacement data is written into invisible
  * next-generation directories first, then ONE atomic manifest replace
  * flips the generation pointers, stats, and stop_reason together. A kill
  * at any point resumes from a consistent snapshot; re-running the forget
  * overwrites the orphans.
  *
  * Filter-bucket maintenance is where the Bloom→Cuckoo fallback lives:
  *  - a bucket losing entries for the FIRST time is rebuilt from its
  *    authoritative surviving hashes as a [[graft.core.CuckooFilter64]]
  *    (Bloom filters cannot delete);
  *  - a bucket that is ALREADY Cuckoo absorbs the retraction as O(deletes)
  *    incremental `remove()`s — no rebuild, no scan of its survivors;
  *  - untouched buckets carry over byte-for-byte (Bloom stays Bloom);
  *  - the no-false-negative contract is fenced by [[FilterBucket]]'s
  *    saturation flag (see its Scaladoc).
  */
object SeenMaintenance {

  /** Outcome of a forget operation. */
  final case class ForgetReport(
      requestedHashes: Long, // distinct known hashes asked to forget
      retractedSeen: Long, // hashes actually removed from the seen set
      reseeded: Long, // frontier rows re-staged for recrawl
      droppedDocuments: Long, // document rows removed (dropDocuments mode)
      bucketsRebuiltToCuckoo: Long, // Bloom (or saturated) buckets rebuilt
      bucketsCuckooDeleted: Long, // already-Cuckoo buckets updated in place
      skippedPending: Long) // targets awaiting their FIRST fetch: not touched

  /** Forget every crawled/known URL under a canonical-URL prefix.
    * Prefix resolution uses the frontier history (every URL that ever held
    * a frontier row); seen hashes of candidates that never passed the crawl
    * filters have no frontier row and are untouched — they would fail the
    * same filters again, so retracting them is pointless. The prefix is
    * canonicalized like any crawl URL (frontier rows store canonical
    * forms — a raw-cased or default-ported prefix would match nothing).
    */
  def forgetPrefix(spark: SparkSession, warehouse: String, prefix: String,
      reseed: Boolean = true, dropDocuments: Boolean = false): ForgetReport = {
    val io = new TableIO(warehouse, spark)
    val canonPrefix = UrlCanonicalizer.canonicalize(prefix).getOrElse(prefix)
    val targets = io.readAll("frontier", TableIO.FrontierSchema, lookahead = 1)
      .filter(col("url").startsWith(canonPrefix))
    forget(spark, io, targets, reseed, dropDocuments)
  }

  /** Forget an explicit URL list (canonicalized here; uncanonicalizable
    * entries are ignored).
    */
  def forgetUrls(spark: SparkSession, warehouse: String, urls: Seq[String],
      reseed: Boolean = true, dropDocuments: Boolean = false): ForgetReport = {
    import spark.implicits._
    val io = new TableIO(warehouse, spark)
    val canon = urls.flatMap(UrlCanonicalizer.canonicalize(_)).distinct
    val hashes = canon.map(UrlCanonicalizer.urlHash).toDF("url_hash")
    val targets = io.readAll("frontier", TableIO.FrontierSchema, lookahead = 1)
      .join(hashes, Seq("url_hash"), "left_semi")
    forget(spark, io, targets, reseed, dropDocuments)
  }

  /** Fold a grow-only set table's per-wave partitions into ONE wave-0
    * partition behind the atomic generation flip — `seen` and
    * `unique_blocks` grow a partition directory per wave, so a crawl of W
    * waves pays O(W) driver `exists()` calls on every `readAll` and O(W)
    * parquet footers per scan; a 10^4-wave crawl wants this periodically.
    * Lossless for set-semantics tables (their rows carry no wave column).
    * Returns the row count of the compacted snapshot.
    */
  def compactTable(spark: SparkSession, warehouse: String,
      name: String): Long = {
    val io = new TableIO(warehouse, spark)
    val (schema, genVal) = compactWith(spark, io, name)
    // the read-back count is the OPERATOR's confirmation — the engine's
    // auto-compaction hook calls compactWith directly and skips this job
    spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .parquet(s"${io.warehouse}/${name}_g$genVal/w0").count()
  }

  /** Same, over an existing TableIO and without the read-back count — the
    * engine's auto-compaction hook (`CrawlConfig.compactEveryWaves`) runs
    * this between wave commits. Returns (schemaDdl, newGeneration).
    */
  private[graft] def compactWith(spark: SparkSession, io: TableIO,
      name: String): (String, Long) = {
    require(name == "seen" || name == "unique_blocks",
      s"compactTable supports the grow-only set tables, not '$name'")
    require(io.committedWave >= -1, "compact needs a bootstrapped warehouse")
    val schema = if (name == "seen") TableIO.SeenSchema
                 else TableIO.UniqueBlocksSchema
    // lookahead mirrors each table's staging contract: seen is staged one
    // wave AHEAD (visible at committedWave+1); unique_blocks is staged at
    // the current wave, so a lookahead read could promote a killed
    // attempt's uncommitted staged partition into the committed snapshot
    val all = io.readAll(name, schema,
      lookahead = if (name == "seen") 1 else 0)
    val (genKey, genVal) = io.stageGeneration(name, atWave = 0, all)
    io.mergeStats(Map(genKey -> genVal))
    io.dropOldGenerations(name)
    (schema, genVal)
  }

  /** Core operation over frontier-shaped target rows. */
  private def forget(spark: SparkSession, io: TableIO, targets: DataFrame,
      reseed: Boolean, dropDocuments: Boolean): ForgetReport = {
    import spark.implicits._
    val c = io.committedWave
    require(c >= -1, "forget needs a bootstrapped warehouse")

    val seen = io.readAll("seen", TableIO.SeenSchema, lookahead = 1)
    // targets still awaiting their FIRST fetch (rows in the next wave's
    // staged frontier) are excluded: they will be fetched momentarily, a
    // reseed row would duplicate the fetch, and retracting their hashes
    // while the frontier row stands would break "in frontier ⊆ in seen"
    // (the staged lookahead partition is not atomically rewritable — the
    // reseed table is the only frontier-shaped table forget may touch)
    val enginePending = io
      .readWave("frontier", c + 1, TableIO.FrontierSchema, lookahead = 1)
      .select($"url_hash").distinct()
    val known = targets
      .join(enginePending, Seq("url_hash"), "left_anti").persist()
    val requested = known.select($"url_hash").distinct().count()
    val skippedPending = targets.select($"url_hash").distinct()
      .join(enginePending, Seq("url_hash"), "left_semi").count()
    val stats = Map.newBuilder[String, Long]

    // ---- 1. recrawl re-seeding (reseed mode) ------------------------------
    val reseedWave = c + 1
    val (reseededCount, reseededHashes) = if (!reseed) {
      // pure retraction CANCELS any pending reseed rows for the targets —
      // a removal request issued after a recrawl request wins, and the
      // retracted hashes must not ride back in at the next wave
      if (io.stat("reseed_wave").contains(reseedWave.toLong) &&
          io.waveExists("reseed", reseedWave, lookahead = 1)) {
        val pending = io.readWave("reseed", reseedWave,
          TableIO.FrontierSchema, lookahead = 1)
        val kept = pending.join(known, Seq("url_hash"), "left_anti").persist()
        val cancelled = pending.count() - kept.count()
        if (cancelled > 0) {
          stats += io.stageGeneration("reseed", atWave = reseedWave, kept)
          stats += ("next_frontier" ->
            math.max(0L, io.stat("next_frontier").getOrElse(0L) - cancelled))
        }
        kept.unpersist()
      }
      (0L, TableIO.emptyDf(spark, "url_hash bigint"))
    } else {
      // one row per target hash: its FIRST frontier appearance (original
      // discovery context — parent, depth), minus rows under a still-active
      // exclude prefix (the retroactive filter outranks recrawl)
      val firstWin = Window.partitionBy($"url_hash").orderBy($"seq", $"wave")
      var rows = known
        .withColumn("rn", row_number().over(firstWin))
        .filter($"rn" === 1).drop("rn")
      val excludes =
        if (io.waveExists("excludes", c))
          io.readWave("excludes", c, TableIO.ExcludesSchema)
            .collect().map(_.getString(0)) // bounded: the exclude-prefix list
        else Array.empty[String]
      excludes.foreach(p => rows = rows.filter(!$"url".startsWith(p)))
      val maxSeq = io.stat("max_seq").getOrElse(0L)
      val assigned = CrawlEngine.assignSeq(spark,
        rows.select($"url", $"url_hash", $"host", $"parent_url", $"depth",
          $"seq".as("orig_seq"), $"redirect_position"),
        Seq("orig_seq"), maxSeq + 1)
        .drop("orig_seq")
        .withColumn("wave", lit(reseedWave))
        .withColumn("is_retry", lit(false))
        .withColumn("retry_count", lit(0))
        .withColumn("retry_after_sec", lit(0))
        .select("url", "url_hash", "host", "parent_url", "depth", "seq",
          "wave", "is_retry", "retry_count", "retry_after_sec",
          "redirect_position")
      // merge with any reseed rows already pending for this wave (repeated
      // forgets before the next run) — the reseed table is generation-
      // flipped like the others, so the merge is crash-atomic too
      val pending0 =
        if (io.stat("reseed_wave").contains(reseedWave.toLong) &&
            io.waveExists("reseed", reseedWave, lookahead = 1))
          io.readWave("reseed", reseedWave, TableIO.FrontierSchema, lookahead = 1)
            .persist() // three counts below derive from it — read disk once
        else TableIO.emptyDf(spark, TableIO.FrontierSchema)
      val pending = pending0
        .join(known, Seq("url_hash"), "left_anti") // re-forgotten: new row wins
      val merged = pending.unionByName(assigned).persist()
      val n = merged.count()
      val pendingKept = pending.count()
      val nAssigned = n - pendingKept
      // pending rows REPLACED by this forget ("new row wins") contributed
      // +1 to next_frontier at their earlier forget, and their replacements
      // count again inside nAssigned — subtract them or repeated forgets
      // drift the fast-empty-gate stat upward (ADVICE r06; the pure-
      // retraction branch above already decrements symmetrically)
      val replacedPending = pending0.count() - pendingKept
      if (n > 0) {
        stats += io.stageGeneration("reseed", atWave = reseedWave, merged)
        stats += ("reseed_wave" -> reseedWave.toLong)
        stats += ("max_seq" -> (maxSeq + nAssigned))
        // the run-loop fast-empty gate must see the injected work
        stats += ("next_frontier" -> math.max(0L,
          io.stat("next_frontier").getOrElse(0L) + nAssigned - replacedPending))
      }
      val hs = merged.select($"url_hash").distinct().persist()
      hs.count() // materialize before merged is unpersisted
      merged.unpersist()
      pending0.unpersist() // no-op for the empty-frame branch
      (nAssigned, hs.toDF())
    }

    // ---- 2. seen rewrite. Two deltas, both preserving "in frontier ⊆ in
    // seen": targets that were NOT re-staged leave the seen set (retract —
    // only verified-present hashes, the precondition of FilterBucket
    // .removeAll's safety argument), and re-staged urls whose hashes had
    // been retracted by an EARLIER forget re-enter it (reAdd — a recrawl
    // request must re-fetch exactly once even if the url is rediscovered
    // as a candidate in the same run). The result becomes generation g+1
    // as a SINGLE wave-0 partition (copy-on-write snapshot replace; the
    // seen table is a set, so folding all waves into one partition is
    // lossless and doubles as compaction).
    val retract = known.select($"url_hash").distinct()
      .join(seen, Seq("url_hash"), "left_semi")
      .join(reseededHashes, Seq("url_hash"), "left_anti").persist()
    val retractedCount = retract.count()
    val reAdd = reseededHashes
      .join(seen, Seq("url_hash"), "left_anti").persist()
    val reAddCount = reAdd.count()
    var rebuilt = 0L
    var cuckooUpdated = 0L
    if (retractedCount > 0 || reAddCount > 0) {
      val newSeen = seen.join(retract, Seq("url_hash"), "left_anti")
        .unionByName(reAdd)
      val (genKey, genVal) = io.stageGeneration("seen", atWave = 0, newSeen)
      stats += (genKey -> genVal)
      val seenAfter = spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(TableIO.SeenSchema))
        .parquet(s"${io.warehouse}/seen_g$genVal/w0").count()
      stats += ("seen_total" -> math.max(1L, seenAfter))

      // ---- 3. filter buckets: Bloom→Cuckoo on first retraction -----------
      // (re-reading the staged generation keeps the rebuild input and the
      // committed snapshot byte-identical)
      val staged = spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(TableIO.SeenSchema))
        .parquet(s"${io.warehouse}/seen_g$genVal/w0")
      val (r, u) =
        maintainFilterBuckets(spark, io, retract, reAdd, staged, c, stats)
      rebuilt = r; cuckooUpdated = u
    }
    reAdd.unpersist()

    // ---- 4. document removal (operator removal request) ------------------
    val droppedDocs = if (!dropDocuments) 0L else {
      val docs = io.readAll("documents", TableIO.DocumentsSchema)
      val targetUrls = known.select($"url".as("doc_id")).distinct()
      val kept = docs.join(targetUrls, Seq("doc_id"), "left_anti")
      val before = docs.count()
      val (genKey, genVal) = io.stageGeneration("documents", atWave = 0, kept)
      stats += (genKey -> genVal)
      val after = spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(TableIO.DocumentsSchema))
        .parquet(s"${io.warehouse}/documents_g$genVal/w0").count()
      before - after
    }

    // ---- 5. the single atomic maintenance commit --------------------------
    io.mergeStats(stats.result(), clearStopReason = reseed && reseededCount > 0)
    io.dropOldGenerations("seen")
    io.dropOldGenerations("blooms")
    io.dropOldGenerations("reseed")
    if (dropDocuments) io.dropOldGenerations("documents")
    known.unpersist(); retract.unpersist(); reseededHashes.unpersist()
    ForgetReport(requested, retractedCount, reseededCount, droppedDocs,
      rebuilt, cuckooUpdated, skippedPending)
  }

  /** Update the persisted filter buckets for a retraction (`retract`) plus
    * re-added recrawl hashes (`reAdd`); `newSeen` is the staged post-op seen
    * snapshot the rebuilds draw from. No-op when the negative cache was
    * never engaged (readBlooms will rebuild from the already-rewritten seen
    * table if it engages later).
    */
  private def maintainFilterBuckets(spark: SparkSession, io: TableIO,
      retract: DataFrame, reAdd: DataFrame, newSeen: DataFrame,
      committedWave: Int,
      stats: scala.collection.mutable.Builder[(String, Long), Map[String, Long]])
      : (Long, Long) = {
    import spark.implicits._
    val nbOpt = io.stat("bloom_buckets")
    if (nbOpt.isEmpty || !io.waveExists("blooms", committedWave) ||
        !io.stat("blooms_v").contains(CrawlEngine.BloomsVersion))
      return (0L, 0L)
    val nb = nbOpt.get.toInt
    val buckets = io.readWave("blooms", committedWave, TableIO.BloomsSchema)
      .as[FilterBucket]

    // one op stream: -1 = retract, +1 = re-add, keyed by bucket
    val ops = retract.select($"url_hash", lit(-1).as("op"))
      .unionByName(reAdd.select($"url_hash", lit(1).as("op")))
      .as[(Long, Int)].persist()

    // bucket-kind directory: O(numPartitions) rows of 3 ints — the only
    // driver-side structure, bounded by parallelism, never by data
    val kinds = buckets.select($"bucket", $"kind", $"saturated")
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    val touched = ops.map { case (h, op) =>
      (CrawlEngine.bloomBucket(h, nb), op)
    }.distinct().collect() // bounded: ≤ 2 * numPartitions pairs
    val affected = touched.map(_._1).toSet
    if (affected.isEmpty) { ops.unpersist(); return (0L, 0L) }
    // a bucket needs a full rebuild (to Cuckoo) iff it LOSES a hash while
    // its current representation cannot delete (Bloom, or saturated, or
    // inconsistent/absent); adds alone never force a rebuild
    val hasDelete = touched.filter(_._2 < 0).map(_._1).toSet
    val rebuildSet = hasDelete.filter { b =>
      kinds.get(b).forall { case (k, sat) => k == FilterBucket.KindBloom || sat }
    }
    val updateSet = affected -- rebuildSet

    // rebuild class: buckets rebuilt as Cuckoo over their hashes in the
    // post-op seen snapshot, sized with headroom for future adds (config
    // capacity share)
    val cfg = io.readConfig().map(CrawlConfigCodec.fromJson)
    val perBucketCap = cfg.map(c => math.max(1024L, c.bloomCapacity / nb))
      .getOrElse(1024L)
    val fpr = cfg.map(_.bloomFpr).getOrElse(0.001)
    // skipped entirely when nothing needs a rebuild — the incremental path
    // must stay O(deletes), never a scan of the seen set
    val rebuildB = spark.sparkContext.broadcast(rebuildSet)
    val rebuilt = if (rebuildSet.isEmpty) spark.emptyDataset[FilterBucket]
    else newSeen.select($"url_hash").as[Long]
      // map-side filter before the shuffle: only rebuild buckets' hashes move
      .filter(h => rebuildB.value.contains(CrawlEngine.bloomBucket(h, nb)))
      .groupByKey(h => CrawlEngine.bloomBucket(h, nb))
      .mapGroups { (b, hs) =>
        val all = hs.toArray
        val cf = CuckooFilter64.forCapacity(math.max(perBucketCap, all.length.toLong))
        var sat = false
        all.foreach { h => if (!cf.add(h)) sat = true }
        FilterBucket.ofCuckoo(b, cf, sat)
      }

    // incremental class: removes hit only Cuckoo-unsaturated buckets (the
    // rebuild set caught every other delete); adds preserve the bucket's
    // kind, creating a fresh Bloom bucket when none exists yet
    val updateB = spark.sparkContext.broadcast(updateSet)
    val updated = ops
      .groupByKey { case (h, _) => CrawlEngine.bloomBucket(h, nb) }
      .cogroup(buckets.groupByKey(_.bucket)) { (b, os, bs) =>
        if (!updateB.value.contains(b)) Iterator.empty
        else {
          val (dels, adds) = os.toArray.partition(_._2 < 0)
          val base = if (bs.hasNext) bs.next()
            else FilterBucket.of(b,
              graft.core.BloomFilter64.forCapacity(perBucketCap, fpr))
          val afterDels =
            if (dels.isEmpty) base else base.removeAll(dels.iterator.map(_._1))
          Iterator(afterDels.addAll(adds.iterator.map(_._1)))
        }
      }

    // untouched buckets carry over unchanged; a rebuild bucket whose rows
    // were ALL deleted simply disappears (an absent bucket means "nothing
    // seen here" — exactly right after full retraction)
    val untouched = buckets.filter(!$"bucket".isin(affected.toSeq: _*))
    val newBuckets = untouched.toDF()
      .unionByName(rebuilt.toDF()).unionByName(updated.toDF())
    stats += io.stageGeneration("blooms", atWave = committedWave, newBuckets)
    ops.unpersist()
    (rebuildSet.size.toLong, hasDelete.diff(rebuildSet).size.toLong)
  }
}
