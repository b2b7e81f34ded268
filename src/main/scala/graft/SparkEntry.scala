package graft

import graft.ops.{Dedup, Multimodal, NgramLm, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SQL-expressible operator has BOTH a `queries` entry and an
  * `oracleSql` entry (DuckDB, same column names/types); hash-based and
  * engine-specific operators (minhash/simhash/LSH/crawl) have queries-only
  * entries → the driver records rows-only checks, and their correctness is
  * asserted in ScalaTest against plain-Scala oracles instead.
  */
object SparkEntry {

  // NOTE (r07): setting spark.sql.files.minPartitionNum here was tried and
  // removed after review — when unset it already falls back to
  // leafNodeDefaultParallelism = defaultParallelism, and the 4 MB
  // openCostInBytes floor dominates these file sizes anyway (verified
  // empirically: identical split counts with the conf unset, set to
  // defaultParallelism, and forced to 256). Narrow-scan parallelism is
  // Par.spread's job, not a dead conf's.
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The documents table spread to full width (Par.spread) — for queries
    * whose dominant cost is per-row column expressions (regex extraction,
    * normalization, splitting) that would otherwise run inside a narrow
    * scan stage. No-op at scale.
    */
  private def tSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.ops.Par.spread(t(spark, dir, name))

  /** Flagship: the north-rule interleaved documents table
    * (doc_id, spans array<struct<kind,text,media_ref,offset>>) produced by
    * the extraction pipeline over a seeded synthetic web.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val site = graft.crawl.SyntheticWeb.generate(
      graft.crawl.SyntheticWeb.Spec(hosts = 2, pagesPerHost = 5, hotHostFactor = 1))
    site.pages.values.toSeq.sortBy(_.url)
      .map(p => (p.url, graft.extract.HtmlToSpans.extract(p.html).spans))
      .toDF("doc_id", "spans")
      .filter(size($"spans") > 0)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregations (SURVEY §2.5) -----------------------------------
    "q_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("decimal(18,4)").as("revenue"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q_orders_by_priority" -> ((s, dir) => {
      // round AFTER the double sum (not decimal casts per value): Spark and
      // DuckDB round double→decimal differently at ulp boundaries, which
      // diverges over a 30k-row sum — rounding the final sum is stable
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- windows (W1 rolling last-10, W2 first-wins) -------------------
    "q_rolling_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-9, 0)
      t(s, dir, "events")
        .withColumn("rolling_avg", round(avg(col("value")).over(w), 6))
        .select(col("event_id"), col("user_id"), col("rolling_avg"))
    }),

    "q_first_wins" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("event_id"), col("user_id"))
    }),

    // ---- joins (J1 anti, J2 semi, broadcast dim join) ------------------
    "q_anti_join" -> ((s, dir) => {
      // D1 seen-set shape: customers with no large order (anti over a
      // filtered build side; unfiltered FK coverage is dense in testdata)
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    "q_semi_join" -> ((s, dir) => {
      t(s, dir, "supplier")
        .join(t(s, dir, "lineitem"),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    "q_join_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    }),

    // ---- sorts / top-k (O1/O2) -----------------------------------------
    "q_topk_per_group" -> ((s, dir) => {
      // NOTE (r07): a two-phase salted top-k (guide §2.5 — l_returnflag
      // has only 3 values, so the per-group sort serializes into 3 tasks
      // at any scale) was implemented and measured 1.29s vs 0.89s here:
      // locally the extra 600k-row exchange outweighs the parallel sort.
      // Reverted; the salted pre-rank is the right move only once a
      // group's rows exceed one task's sort budget.
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      t(s, dir, "lineitem")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("l_returnflag"), col("rank"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
    }),

    "q_global_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // ---- time windows (streaming-shaped batch agg) ---------------------
    "q_hourly_events" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // ---- documents: language histogram / split (A8/O5) -----------------
    "q_lang_histogram" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 10)
        .orderBy(col("lang"))
    }),

    "q_split_assign" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("split", TextOps.splitAssign(col("doc_id")))
        .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("split"))
    }),

    "q_chunk_docs" -> ((s, dir) => {
      // overlapping token-window chunking (64-token windows, 16 overlap):
      // boundaries, sizes, and every chunk's md5 re-derive in plain SQL
      TextOps.chunkDocs(t(s, dir, "documents"), "doc_id", "text",
        maxTokens = 64, overlap = 16)
        .withColumnRenamed("id", "doc_id")
    }),

    "q_lang_rebalance" -> ((s, dir) => {
      // multilingual rebalancing to a target mix (largest achievable size,
      // no upsampling) — the keep decision is the portable md5-prefix
      // uniform, so counts, rates, and decisions re-derive in plain SQL
      TextOps.langRebalance(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.4, "fr" -> 0.15, "de" -> 0.15, "es" -> 0.15,
          "zh" -> 0.15))
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy(col("lang"))
    }),

    "q_pack_sequences" -> ((s, dir) => {
      // context-window sequence packing (FFD per hash-routed partition):
      // the oracle re-derives every row's token count from the documents
      // table and re-aggregates the emitted bins, so the capacity
      // constraint and the fill accounting are externally verified even
      // though the assignment itself is the engine's own
      TextOps.packSequences(t(s, dir, "documents"), "doc_id", "text",
        capacity = 512, numPartitions = 8)
        .withColumnRenamed("id", "doc_id")
    }),

    // ---- text analysis (A5/C10 + pipeline ops) --------------------------
    "q_doc_stats" -> ((s, dir) => {
      val d = tSpread(s, dir, "documents")
      d.select(col("doc_id"),
        length(col("text")).as("chars"),
        TextOps.wordCount(col("text")).as("words"),
        TextOps.tokenCount(col("text")).as("tokens"),
        TextOps.fingerprint(col("text")).as("fingerprint"))
    }),

    "q_quality" -> ((s, dir) => {
      TextOps.withQuality(tSpread(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_words"), col("avg_word_len"),
          col("punct_ratio"), col("digit_ratio"), col("stopword_ratio"),
          col("quality_ok"))
    }),

    "q_lm_typicality" -> ((s, dir) => {
      // corpus-self-trained bigram LM typicality (the CCNet/Gopher
      // perplexity-filter shape): train = two capped count aggregations,
      // score = broadcast-model mapPartitions, no shuffle in scoring.
      // Small caps keep the sf0.01 oracle CTE cheap; production defaults
      // are the method's 32k/256k
      NgramLm.typicality(t(s, dir, "documents"), "doc_id", "text",
          minWordCount = 3L, maxVocab = 4096,
          minBigramCount = 2L, maxBigrams = 1 << 16)
        .withColumnRenamed("id", "doc_id")
    }),

    "q_lang_guess" -> ((s, dir) => {
      tSpread(s, dir, "documents")
        .select(col("doc_id"), TextOps.langGuess(col("text")).as("lang_guess"))
    }),

    "q_pii_scrub" -> ((s, dir) => {
      // plant deterministic PII in each row so the scrub has real work
      val planted = t(s, dir, "documents").select(col("doc_id"),
        // plain % (dividend-sign) on BOTH sides — pmod would diverge from
        // the DuckDB oracle's % if a fixture ever carried negative ids
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 10.0."), col("doc_id") % 256,
          lit(".1 now")).as("dirty"))
      planted.select(col("doc_id"),
        TextOps.scrubPii(col("dirty")).as("scrubbed"))
    }),

    "q_repetition" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        round(TextOps.dupTokenFrac(col("text")), 4).as("dup_token_frac"))
    }),

    // ---- dedup family ---------------------------------------------------
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactFirstWins(t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("is_canonical"))
    }),

    "q_pipeline_stats" -> ((s, dir) => {
      // the END-TO-END training-data preparation pipeline as ONE
      // oracle-checked DAG: decontaminate (vs the fixed 20-doc eval
      // stand-in) → exact first-wins dedup → quality gate → corpus
      // budget stats — the sequence a user runs before export, each
      // stage already individually oracled (q_decontam / q_dedup_exact /
      // q_quality), here composed so the STAGE WIRING is verified too
      val docs = t(s, dir, "documents")
      val flags = Dedup.contaminationFlags(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 20), "text", n = 8, minHits = 1)
      val clean = docs.join(
        flags.filter(!col("contaminated")).select(col("id").as("doc_id")),
        "doc_id")
      val deduped = Dedup.exactFirstWins(clean, "text", "doc_id")
      val gated = TextOps.withQuality(deduped, "text")
      gated.agg(
        count(lit(1)).as("n_clean"),
        sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("is_canonical") && col("quality_ok"), 1L)
          .otherwise(0L)).as("n_kept"),
        // n_words is withQuality's own column — ONE word-count definition
        sum(when(col("is_canonical") && col("quality_ok"),
          col("n_words").cast("long"))
          .otherwise(0L)).as("kept_words"))
    }),

    "q_bpe_tokens" -> ((s, dir) => {
      // model-token budgeting: train 256 merges on a deterministic 64-doc
      // sample, tokenize every document distributed. The merge table is
      // engine-specific (canonical merge-sequence oracle in OpsSpec), but
      // n_words and the text_rt detokenization ROUND-TRIP are not: the
      // DuckDB oracle recomputes both from the documents table, taking
      // only n_bpe_tokens from the emitted rows — segmentation
      // losslessness is hash-checked per document
      val docs = t(s, dir, "documents")
      val merges = graft.ops.Bpe.train(docs, "text",
        numMerges = 256, sampleDocs = 64)
      graft.ops.Bpe.tokenizeDocs(docs, "doc_id", "text", merges)
        .select(col("id").as("doc_id"), col("n_words"), col("n_bpe_tokens"),
          col("text_rt"))
        .orderBy(col("doc_id"))
    }),

    "q_normalize_text" -> ((s, dir) => {
      // Unicode canonicalization via the native UnicodeNormalize
      // Expression (codegen, no UDF): the synthetic corpus is ASCII, so a
      // deterministic multi-form suffix — composed é, DECOMPOSED
      // e+U+0301, U+212B (an NFC singleton → Å), ï, ñ — exercises real
      // normalization; the oracle runs DuckDB's utf8proc twins
      // (nfc_normalize / strip_accents)
      import graft.functions.UnicodeNormalize.{nfc, foldAccents}
      val raw = concat(col("text"),
        lit(" résumé Å naïve piñata"))
      tSpread(s, dir, "documents").select(
          col("doc_id"),
          length(raw).as("n_raw"),
          nfc(raw).as("norm_text"),
          length(nfc(raw)).as("n_norm"),
          foldAccents(nfc(raw)).as("folded"))
        .orderBy(col("doc_id"))
    }),

    "q_decontam" -> ((s, dir) => {
      // benchmark decontamination: the first 20 docs stand in for an eval
      // suite (a FIXED-size benchmark at every SF — eval suites do not
      // grow with the training corpus); any training doc sharing an
      // 8-word shingle with them is flagged. Spark joins on
      // xxhash64(shingle), the oracle on the shingle string — identical
      // counts (collisions ~|sh|²/2^64)
      val docs = t(s, dir, "documents")
      Dedup.contaminationFlags(docs, "doc_id", "text",
          docs.filter(col("doc_id") < 20), "text", n = 8, minHits = 1)
        .select(col("id").as("doc_id"), col("n_hits"), col("contaminated"))
        .orderBy(col("doc_id"))
    }),

    "q_jaccard_pairs" -> ((s, dir) => {
      // maxDocFreq = 64 frequency-caps the blocking join (hot shingles are
      // quadratic); jaccard is over the capped sets on both sides — the
      // oracle applies the identical cap
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 2, threshold = 0.2, maxDocFreq = 64)
    }),

    // hash-family dedup: engine-specific hashes → rows-only driver check;
    // correctness asserted against plain-Scala oracles in OpsSpec
    "q_minhash_lsh" -> ((s, dir) => {
      // 3-gram shingles: distinctive enough that LSH banding does not
      // degenerate on the small-vocabulary synthetic corpus
      Dedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 16, rowsPerBand = 2, threshold = 0.2)
    }),

    "q_minhash_jaccard" -> ((s, dir) => {
      // the LSH pipeline's VERIFICATION stage: exact n-gram Jaccard over
      // the MinHash-LSH candidate pairs (candidates are approximate;
      // survivors are decided by the exact measure). The DuckDB oracle
      // recomputes every emitted pair's jaccard from the documents table,
      // so the shingle/intersection/union math is hash-checked on the
      // exact rows LSH produced — the oracle shape VERDICT_r05 prescribed
      // for shrinking the rows-only tail
      val docs = t(s, dir, "documents")
      val cand = Dedup.minHashLshPairs(docs, "doc_id", "text",
          n = 3, k = 16, rowsPerBand = 2, threshold = 0.2)
        .select(col("id_a"), col("id_b"))
      Dedup.jaccardForPairs(cand, docs, "doc_id", "text", n = 3)
    }),

    "q_exact_substr" -> ((s, dir) => {
      // cross-document exact-substring duplicates (Lee et al. 2022
      // ExactSubstr at word level): one row per duplicated 20-token window
      // occurrence that is not the retained first-occurrence copy. Every
      // row carries md5 of BOTH sides' token slices, so the DuckDB oracle
      // re-derives win_md5 and owner_md5 from the documents table and a
      // hash match proves each emitted row is a genuine byte-equal
      // cross-document duplicate.
      Dedup.exactSubstrMatches(t(s, dir, "documents"), "doc_id", "text",
        minTokens = 20)
    }),

    "q_simhash_pairs" -> ((s, dir) => {
      // maxHamming = 7 is the contractual radius: 4 blocks of 16 bits with
      // single-bit-flip probe keys GUARANTEE recall up to Hamming 7 while
      // keeping a 2^16 join-key space (Dedup.simHashCandidatePairs doc).
      // Both members' hashes ride the output so the DuckDB oracle
      // recomputes hamming = bit_count(sim_a XOR sim_b) on the exact
      // emitted rows (the hash kernel itself is pinned by OpsSpec)
      Dedup.simHashPairsWithHashes(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 7)
    }),

    // ---- similarity search ----------------------------------------------
    "q_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    "q_embedding_neardup" -> ((s, dir) => {
      Similarity.exactNearDupPairs(
        t(s, dir, "embeddings").filter(col("vec_id") < 200),
        "vec_id", "embedding", threshold = 0.3)
    }),

    "q_ann_lsh" -> ((s, dir) => {
      // dim derived from the data (all 64 dims hashed), plane count scaled
      // to the corpus size (planesFor: ~8 at sf0.1, ~25 at 10^9 vectors);
      // recall at moderate similarity is the documented LSH trade-off.
      // Oracled by PAIR-RECHECK: DuckDB recomputes every emitted pair's
      // cosine from the embeddings table and must hash-match cos_sim
      Similarity.lshNearDupPairs(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.25, numTables = 8)
    }),

    "q_dedup_clusters" -> ((s, dir) => {
      // transitive near-dup clustering over the exact cosine pairs:
      // iterative min-label propagation; cluster = min member id, so the
      // result is deterministic and oracle-comparable (recursive CTE)
      Dedup.connectedComponents(
        Similarity.exactNearDupPairs(
          t(s, dir, "embeddings").filter(col("vec_id") < 200),
          "vec_id", "embedding", threshold = 0.3))
        .orderBy(col("id"))
    }),

    "q_pq_topk" -> ((s, dir) => {
      // product quantization: 8-byte codes + ADC scan + exact rerank —
      // the candidate SET is codebook-specific, but the rerank returns
      // TRUE cosines, so the emitted rows are score-rechecked by the
      // DuckDB topkRecheckSql oracle; kernel exactness and
      // recall-vs-brute-force pinned in OpsSpec
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, m = 8, ksub = 16, rerank = 128)
    }),

    "q_ivfpq_topk" -> ((s, dir) => {
      // IVF+PQ composition: coarse cells prune the scan to nprobe/nlist
      // of the corpus, residual-PQ codes make the probed scan m bytes per
      // vector, exact rerank restores true cosines — the FAISS IVFPQ
      // shape; the rerank's true cosines make the emitted rows
      // score-recheckable (topkRecheckSql oracle); recall floor +
      // exact-rerank invariant pinned in OpsSpec
      // 2 Lloyd iterations: the double training (coarse + PQ) is the term
      // that AMORTIZES at corpus scale while the sf0.1 bench is training-
      // dominated; recall at (8/4, rerank 128) is scan-side, not
      // iteration-side (OpsSpec pins the floor at the default)
      val emb = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4,
        m = 8, ksub = 16, iterations = 2, rerank = 128)
    }),

    "q_pq_exact" -> ((s, dir) => {
      // PQ at rerank = corpus: every ADC candidate survives to the exact
      // rerank, so the result EQUALS brute-force top-k — this config puts
      // the PQ plumbing (train/encode/ADC scan/rerank joins) under the
      // same DuckDB oracle as q_cosine_topk, while q_pq_topk keeps the
      // approximate production config in the bench
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, m = 8, ksub = 16, rerank = Int.MaxValue)
    }),

    "q_ivfpq_exact" -> ((s, dir) => {
      // IVFPQ at nprobe = nlist + rerank = corpus: all cells probed, full
      // exact rerank — provably brute-force-equal (OpsSpec pins the
      // exactness), now ALSO hash-checked against the DuckDB cosine
      // oracle end-to-end; q_ivfpq_topk keeps the approximate config
      val emb = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nlist = 8, nprobe = 8,
        m = 8, ksub = 16, iterations = 2, rerank = Int.MaxValue)
    }),

    "q_ivf_topk" -> ((s, dir) => {
      // IVF ANN with nprobe = nlist: probes every cell, so the result must
      // EQUAL the brute-force top-k — the oracle proves the IVF plumbing
      // (train/assign/probe/rerank) end-to-end; recall at nprobe < nlist
      // is asserted in OpsSpec
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nlist = 8, nprobe = 8)
    }),

    // ---- multimodal plumbing --------------------------------------------
    "q_media_meta" -> ((s, dir) => {
      // n_bytes is excluded from the oracle projection: image rows now
      // carry real PNG bytes, whose encoded size SQL cannot predict
      Multimodal.mediaMeta(
          Multimodal.synthesizeMedia(t(s, dir, "documents"), "doc_id", "text"))
        .select(col("media_id"), col("kind"), col("width"), col("height"))
    }),

    "q_media_resize" -> ((s, dir) => {
      // thumbnail/normalize step over REAL image bytes: resize to fit
      // 24x24, then report the dimensions DECODED FROM THE RESIZED BLOBS —
      // the oracle recomputes them from the metadata formula with integer
      // math, so a resize that didn't actually rewrite the bytes (or got
      // the floor/aspect contract wrong) hash-mismatches
      val spark = s
      import spark.implicits._
      Multimodal.resizeImages(
          Multimodal.synthesizeMedia(t(s, dir, "documents"), "doc_id", "text"),
          24, 24)
        .filter(_.kind == "image")
        .map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.blob))
          (r.media_id, img.getWidth, img.getHeight)
        }.toDF("media_id", "out_w", "out_h")
    }),

    "q_media_features" -> ((s, dir) => {
      // the synthetic pixels/samples/frame-lumas are pure integer
      // formulas of doc_id, so the DuckDB oracle re-derives every mean
      // through the REAL JDK encode→decode round trip (only the
      // container byte size rides through recheck-style — encoder
      // framing isn't SQL)
      val spark = s
      import spark.implicits._
      Multimodal.extractFeatures(
          Multimodal.synthesizeMedia(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("width"),
          col("height"), round(element_at(col("feature"), 2), 4).as("mean_byte"))
    }),

    "q_winnow_pairs" -> ((s, dir) => { // rows-only: rolling-hash fingerprints
      graft.ops.Winnowing.fingerprintPairs(
        t(s, dir, "documents").filter(col("doc_id") < 300),
        "doc_id", "text", k = 8, w = 16, threshold = 0.05, maxDocFreq = 64)
    }),

    "q_winnow_jaccard" -> ((s, dir) => {
      // the winnowing pipeline's VERIFICATION stage (mirror of
      // q_minhash_jaccard): exact character-8-gram Jaccard over the
      // fingerprint candidate pairs — fingerprints estimate this measure
      // from the winnowed subset; survivors are decided by the exact one.
      // The DuckDB oracle recomputes every emitted pair's gram Jaccard
      // from the documents table, hash-checking the normalization /
      // gram / intersection math on the exact rows winnowing produced
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
      val cand = graft.ops.Winnowing.fingerprintPairs(docs,
          "doc_id", "text", k = 8, w = 16, threshold = 0.05, maxDocFreq = 64)
        .select(col("id_a"), col("id_b"))
      graft.ops.Winnowing.exactKGramJaccardForPairs(cand, docs,
        "doc_id", "text", k = 8)
    }),

    // ---- dataset export (§3.3): gate + split, oracle-checked -------------
    "q_export_stats" -> ((s, dir) => {
      graft.ops.DatasetExport.prepare(
          t(s, dir, "documents")
            .withColumn("doc_url", concat(lit("https://"), col("source"),
              lit(".example.com/d"), col("doc_id"))),
          "doc_url", langFilter = Some("en"), minDocs = 10)
        .groupBy(col("website"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("website"), col("split"))
    }),

    // ---- pipeline composition: legacy ingest → dedup → stats ------------
    "q_legacy_export_stats" -> ((s, dir) => {
      // S6 end-to-end: render 200 documents into the reference's legacy
      // `##`-marker files, ingest them back through the partition-parallel
      // binaryFile source, then run the standard dedup + aggregation over
      // the ROUND-TRIPPED text — proving a legacy corpus feeds the same
      // pipeline as a live crawl. The oracle computes identical stats from
      // the parquet source directly, so any round-trip corruption fails
      // the hash compare. (Files land in a fresh local temp dir — query
      // fixture plumbing; production legacy corpora live on a shared fs
      // and enter at Graft.readLegacy.)
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-legacy-q").toString
      t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id").cast("long"), col("text"), col("lang"))
        .as[(Long, String, String)]
        .foreachPartition { it: Iterator[(Long, String, String)] =>
          it.foreach { case (id, text, lang) =>
            val doc = graft.extract.LegacyDoc(
              uri = f"doc://$id%05d", title = f"Doc $id%05d", timestamp = "",
              metadata = Map("lang" -> lang),
              spans = Vector(graft.core.Span("TextBlock.Text", text, "", 0)))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(tmp, f"doc_$id%05d.txt"),
              graft.extract.LegacyDocFormat.render(doc)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        }
      val texts = Graft.readLegacy(s, tmp)
        .select(col("uri"),
          concat_ws("\n", expr(
            "transform(filter(spans, x -> x.kind = 'TextBlock.Text'), x -> x.text)"))
            .as("text"))
        .withColumn("ord", substring(col("uri"), 7, 5).cast("long"))
      val agg = Dedup.exactFirstWins(texts, "text", "ord")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_unique"),
          sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("total_words"))
      // materialize the 1-row aggregate NOW so the fixture tree can be
      // deleted before returning — repeated Verify/Bench runs were
      // accumulating ~200 temp files per invocation
      val rows = agg.collect().toSeq
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close() // the stream holds directory fds
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), agg.schema)
    }),

    // ---- pipeline composition: dedup → export as ONE DAG ----------------
    "q_neardup_export" -> ((s, dir) => {
      // the full pipeline story (mine pairs → cluster → keep canonicals →
      // gate + split for export) as a single oracle-checked query
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 200)
      val pairs = Similarity.exactNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.3)
      val clusters = Dedup.connectedComponents(pairs)
        .withColumnRenamed("id", "__cc_id")
      val canon = t(s, dir, "documents").filter(col("doc_id") < 200)
        .join(clusters, col("doc_id") === col("__cc_id"), "left")
        .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
        .filter(col("cluster") === col("doc_id"))
      graft.ops.DatasetExport.prepare(
          canon.withColumn("doc_url", concat(lit("https://"), col("source"),
            lit(".example.com/d"), col("doc_id"))),
          "doc_url", langFilter = Some("en"), minDocs = 2)
        .groupBy(col("website"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("website"), col("split"))
    }),

    // ---- crawl-native (north rule; engine-specific → rows-only) ---------
    "q_crawl_documents" -> ((s, dir) => {
      val d = entry(s)
      d.select(col("doc_id"), size(col("spans")).as("n_spans"))
    }),

    // PDF conversion path (S6/J5/O4): deterministic uncompressed-PDF
    // fixtures through the real extractor — sections from the title
    // heuristic, repeated headers/footers removed across pages
    "q_pdf_documents" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      import graft.extract.{PdfFixture, PdfToSpans}
      // page-distinct text must differ by WORDS, not digits: the
      // decoration classifier (J5) matches repeats digit-insensitively,
      // so a corpus whose pages differ only in numerals is — correctly —
      // removed wholesale as headers/footers (a rows-only check once hid
      // exactly that: every text span silently vanished)
      val W = Vector("alpha", "bravo", "carbon", "delta", "ember", "falcon",
        "garnet", "harbor", "iris", "juniper", "krypton", "lumen", "meadow",
        "nectar", "onyx", "prism")
      val fixtures = (0 until 16).map { i =>
        val pages = Seq.tabulate(2 + i % 3) { p =>
          val wi = W(i % 16)
          val wp = W((i + 3 * p + 1) % 16)
          Seq(
            PdfFixture.Block(Seq(s"Chapter $wi $wp"), fontSize = 18.0),
            PdfFixture.Block(Seq(
              s"pdf body paragraph about $wi and $wp with distinct content",
              s"second line mentioning $wp for the $wi paragraph")),
            PdfFixture.Block(Seq(s"closing remarks on $wi $wp")))
        }
        // the corpus cycles through the real-world layouts — classic
        // uncompressed, /FlateDecode, PDF 1.5 (ObjStm + xref stream +
        // indirect lengths), an ASCII85+Flate filter chain, an embedded
        // SUBSET font (/ToUnicode CMap; glyph codes ≠ char codes — 1-byte
        // and 2-byte CID variants), a /Differences-remapped simple font,
        // an embedded /Subtype /Image XObject (Media.Image spans), and a
        // Type0/Identity-H font with NO /ToUnicode whose embedded TrueType
        // cmap is the only decoding source; text extraction must be
        // identical across all of them
        val body = (i % 8) match {
          case 0 => PdfFixture.pdf(pages, title = s"Fixture $i",
            header = "Shared Running Header", pageNumbers = true)
          case 1 => PdfFixture.pdf(pages, title = s"Fixture $i",
            header = "Shared Running Header", pageNumbers = true,
            compress = true)
          case 2 => PdfFixture.pdfModern(pages, title = s"Fixture $i",
            header = "Shared Running Header", pageNumbers = true)
          case 3 => PdfFixture.pdfFiltered(pages, s"Fixture $i",
            Seq("ASCII85Decode", "FlateDecode"),
            header = "Shared Running Header", pageNumbers = true)
          case 4 => PdfFixture.pdfSubsetFont(pages, title = s"Fixture $i",
            header = "Shared Running Header", pageNumbers = true,
            twoByte = i >= 8)
          case 5 => PdfFixture.pdfDifferencesFont(pages, title = s"Fixture $i",
            header = "Shared Running Header", pageNumbers = true)
          case 6 => PdfFixture.pdfWithImage(pages, title = s"Fixture $i",
            imageW = 100 + i, imageH = 60 + i)
          case _ => PdfFixture.pdfEmbeddedCmapFont(pages,
            title = s"Fixture $i", header = "Shared Running Header",
            pageNumbers = true, format12 = i >= 8, cidToGidStream = i >= 12)
        }
        (s"pdf_$i", body)
      }
      fixtures.toDF("doc_id", "body").as[(String, String)].map { case (id, body) =>
        val d = PdfToSpans.extract(body)
        (id, d.title, d.spans.size,
          d.spans.count(_.kind == "Section.Start"),
          d.spans.count(_.kind == "TextBlock.Text"),
          d.spans.count(_.kind == "Media.Image"),
          d.spans.exists(sp => sp.text.contains("Running Header") || sp.text.startsWith("Page ")))
      }.toDF("doc_id", "title", "n_spans", "n_sections", "n_blocks", "n_media", "has_decoration")
    })
  )

  /** Brute-force cosine top-k oracle — shared verbatim by q_cosine_topk
    * and the two ANN exactness configurations (q_pq_exact at rerank =
    * corpus; q_ivfpq_exact at nprobe = nlist + rerank = corpus), which
    * are provably equal to brute force.
    */
  private val cosineTopkSql: String =
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         list_sum(list_transform(list_zip(q.embedding, c.embedding),
      |             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |         / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |          * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cs
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
      |SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim, rank FROM (
      |  SELECT query_id, neighbor_id, cs,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY cs DESC, neighbor_id ASC) AS rank
      |  FROM scored) WHERE rank <= 5""".stripMargin

  /** Score-recheck oracle for approximate top-k configs whose rerank
    * returns TRUE cosines: read the emitted (query_id, neighbor_id) rows
    * back from the Verify output, recompute each cosine from the
    * embeddings table, and re-derive rank within the emitted rows (the
    * engine ranks by the same cosine with the same neighbor-id tie-break,
    * so rank restricted to its own top-k is reproduced exactly).
    */
  private def topkRecheckSql(name: String): String =
    s"""WITH out AS (
       |  SELECT query_id, neighbor_id FROM '__VERIFY_OUT__/$name/*.parquet'),
       |scored AS (
       |  SELECT o.query_id, o.neighbor_id,
       |         list_sum(list_transform(list_zip(q.embedding, c.embedding),
       |             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |         / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |          * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cs
       |  FROM out o JOIN embeddings q ON q.vec_id = o.query_id
       |             JOIN embeddings c ON c.vec_id = o.neighbor_id)
       |SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim,
       |       row_number() OVER (PARTITION BY query_id
       |         ORDER BY cs DESC, neighbor_id ASC) AS rank
       |FROM scored""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS revenue,
        |       avg(l_quantity) AS avg_qty,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_orders_by_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rolling_window" ->
      """SELECT event_id, user_id,
        |       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS rolling_avg
        |FROM events""".stripMargin,

    "q_first_wins" ->
      """SELECT event_type, event_id, user_id FROM (
        |  SELECT event_type, event_id, user_id,
        |         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "q_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin,

    "q_join_agg" ->
      """SELECT p_brand, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_topk_per_group" ->
      """SELECT l_returnflag, rank, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rank
        |  FROM lineitem) WHERE rank <= 3""".stripMargin,

    "q_global_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_lang_histogram" ->
      """SELECT lang, count(*) AS n_docs FROM documents
        |GROUP BY 1 HAVING count(*) >= 10 ORDER BY 1""".stripMargin,

    "q_split_assign" ->
      """SELECT split, count(*) AS n_docs FROM (
        |  SELECT CASE
        |    WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10 <= 7 THEN 'train'
        |    WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10 = 8 THEN 'valid'
        |    ELSE 'test' END AS split
        |  FROM documents) GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_chunk_docs" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE regexp_matches(text, '\S')),
        |starts AS (
        |  SELECT doc_id, t,
        |         CAST(u.i AS INT) AS start_tok,
        |         CAST(u.i / 48 AS INT) AS chunk_index
        |  FROM toks, unnest(range(0, greatest(len(t) - 16 - 1, 0) + 1, 48)) u(i))
        |SELECT doc_id, chunk_index, start_tok,
        |       CAST(least(64, len(t) - start_tok) AS INT) AS chunk_tokens,
        |       md5(array_to_string(t[start_tok + 1 : start_tok + 64], ' ')) AS chunk_md5
        |FROM starts""".stripMargin,

    "q_lang_rebalance" ->
      """WITH counts AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1),
        |t(lang, share) AS (VALUES
        |  ('en', CAST(0.4 AS DOUBLE)), ('fr', CAST(0.15 AS DOUBLE)),
        |  ('de', CAST(0.15 AS DOUBLE)), ('es', CAST(0.15 AS DOUBLE)),
        |  ('zh', CAST(0.15 AS DOUBLE))),
        |r0 AS (SELECT c.lang, c.n, t.share, c.n / t.share AS np
        |       FROM counts c JOIN t USING (lang) WHERE c.n > 0),
        |rates AS (
        |  SELECT lang, share * (SELECT min(np) FROM r0) / n AS rate FROM r0),
        |kept AS (
        |  -- LEFT JOIN + coalesce(rate, 0) mirrors the engine's otherwise(0.0)
        |  -- fold: untargeted (or null) languages keep nothing but still count
        |  SELECT d.lang,
        |    (CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::INT AS DOUBLE)
        |       / CAST(65536 AS DOUBLE)) < coalesce(r.rate, CAST(0 AS DOUBLE)) AS kept
        |  FROM documents d LEFT JOIN rates r ON r.lang = d.lang)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pack_sequences" ->
      """WITH out AS (
        |  SELECT doc_id, bin_id FROM '__VERIFY_OUT__/q_pack_sequences/*.parquet'),
        |n AS (
        |  SELECT o.doc_id, o.bin_id,
        |         CASE WHEN len(trim(text)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |  FROM out o JOIN documents d ON d.doc_id = o.doc_id),
        |b AS (SELECT bin_id, CAST(sum(n_tokens) AS BIGINT) AS bin_total,
        |             count(*) AS bin_docs
        |      FROM n GROUP BY 1)
        |SELECT n.doc_id, n.n_tokens, n.bin_id, b.bin_total, b.bin_docs,
        |       b.bin_total <= 512 AS fits
        |FROM n JOIN b USING (bin_id)""".stripMargin,

    "q_doc_stats" ->
      """SELECT doc_id, length(text) AS chars,
        |       CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(string_split_regex(trim(text), '\s+')) END AS words,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS tokens,
        |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents""".stripMargin,

    // re-derives the whole LM pipeline — tokens, capped vocabulary,
    // mapped-unigram and capped bigram counts, add-k score — from the
    // documents table; parameters mirror the query literally
    "q_lm_typicality" ->
      """WITH docs_l AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             x -> x <> '') AS l
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, u['pos'] AS pos, u['w'] AS w FROM (
        |    SELECT doc_id, unnest([{'pos': i, 'w': l[i]} FOR i IN range(1, len(l) + 1)]) AS u
        |    FROM docs_l)),
        |uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        |vocab AS (
        |  SELECT w, c FROM uni WHERE c >= 3 AND w <> '<unk>'
        |  QUALIFY row_number() OVER (ORDER BY c DESC, w) <= 4096),
        |vsz AS (SELECT count(*) + 1 AS v FROM vocab),
        |oov AS (SELECT greatest(1, (SELECT count(*) FROM uni)
        |                           - (SELECT count(*) FROM vocab)) AS t),
        |mapped AS (
        |  SELECT t.doc_id, t.pos, coalesce(vo.w, '<unk>') AS m
        |  FROM toks t LEFT JOIN vocab vo ON vo.w = t.w),
        |uni_m AS (SELECT m, count(*) AS c FROM mapped GROUP BY 1),
        |big AS (
        |  SELECT a.doc_id, a.m AS w1, b.m AS w2
        |  FROM mapped a JOIN mapped b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |bigc AS (
        |  SELECT w1, w2, count(*) AS c FROM big GROUP BY 1, 2
        |  HAVING count(*) >= 2
        |  QUALIFY row_number() OVER (ORDER BY count(*) DESC, w1, w2) <= 65536),
        |scored AS (
        |  SELECT g.doc_id, count(*) AS nb,
        |         avg(ln((coalesce(bc.c, 0) + 0.1)
        |                / (um.c + 0.1 * (SELECT v FROM vsz)))
        |             - CASE WHEN g.w2 = '<unk>'
        |                    THEN ln((SELECT t FROM oov)) ELSE 0 END) AS lp
        |  FROM big g
        |  LEFT JOIN bigc bc ON bc.w1 = g.w1 AND bc.w2 = g.w2
        |  JOIN uni_m um ON um.m = g.w1
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(len(d.l) AS BIGINT) AS n_words,
        |       CAST(coalesce(s.nb, 0) AS BIGINT) AS n_bigrams,
        |       round(coalesce(s.lp, 0.0), 6) AS avg_logprob
        |FROM docs_l d LEFT JOIN scored s ON s.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_quality" ->
      """SELECT doc_id, n_words,
        |       CASE WHEN n_words > 0 THEN round(CAST(length(text) - n_words + 1 AS DOUBLE) / n_words, 4) ELSE 0.0 END AS avg_word_len,
        |       CASE WHEN length(text) > 0 THEN round(CAST(punct AS DOUBLE) / length(text), 4) ELSE 0.0 END AS punct_ratio,
        |       CASE WHEN length(text) > 0 THEN round(CAST(digits AS DOUBLE) / length(text), 4) ELSE 0.0 END AS digit_ratio,
        |       CASE WHEN n_words > 0 THEN round(CAST(stop_hits AS DOUBLE) / n_words, 4) ELSE 0.0 END AS stopword_ratio,
        |       -- the gate reads the 4-dp ROUNDED ratios (the Spark side
        |       -- gates on its reported punct_ratio/stopword_ratio columns)
        |       (n_words BETWEEN 5 AND 100000)
        |         AND (CASE WHEN length(text) > 0 THEN round(CAST(punct AS DOUBLE) / length(text), 4) ELSE 0.0 END < 0.3)
        |         AND (CASE WHEN n_words > 0 THEN round(CAST(stop_hits AS DOUBLE) / n_words, 4) ELSE 0.0 END > 0.0) AS quality_ok
        |FROM (
        |  SELECT doc_id, text,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS punct,
        |         len(regexp_extract_all(text, '[0-9]')) AS digits,
        |         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |             w -> w IN ('the','a','of','to','and','in','is','it'))) AS stop_hits
        |  FROM documents)""".stripMargin,

    "q_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      text || ' contact user' || doc_id || '@example.com or 10.0.' ||
        |        (doc_id % 256) || '.1 now',
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
        |    AS scrubbed
        |FROM documents""".stripMargin,

    "q_repetition" ->
      """SELECT doc_id,
        |  CASE WHEN len(string_split_regex(trim(text), '\s+')) > 0 THEN
        |    round(CAST(len(string_split_regex(trim(text), '\s+')) -
        |               len(list_distinct(string_split_regex(trim(text), '\s+')))
        |          AS DOUBLE) / len(string_split_regex(trim(text), '\s+')), 4)
        |  ELSE 0.0 END AS dup_token_frac
        |FROM documents""".stripMargin,

    "q_lang_guess" ->
      """SELECT doc_id, CASE
        |  WHEN en >= fr AND en >= de AND en > 0 THEN 'en'
        |  WHEN fr >= de AND fr > 0 THEN 'fr'
        |  WHEN de > 0 THEN 'de'
        |  ELSE '?' END AS lang_guess
        |FROM (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        w -> w IN ('the','and','of','is','in'))) AS en,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        w -> w IN ('le','la','et','est','les'))) AS fr,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        w -> w IN ('der','die','das','und','ist'))) AS de
        |  FROM documents)""".stripMargin,

    "q_dedup_exact" ->
      """SELECT doc_id, rn = 1 AS is_canonical FROM (
        |  SELECT doc_id, row_number() OVER (
        |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |    ORDER BY doc_id) AS rn
        |  FROM documents)""".stripMargin,

    "q_normalize_text" ->
      // suffix built with chr() so the oracle is encoding-proof: composed
      // é (233), decomposed e+combining-acute (769), angstrom sign (8491,
      // an NFC singleton -> Å), ï (239), ñ (241)
      """WITH raw AS (
        |  SELECT doc_id,
        |    text || ' r' || chr(233) || 'sume' || chr(769) || ' ' || chr(8491)
        |         || ' na' || chr(239) || 've pi' || chr(241) || 'ata' AS r
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(r) AS INT) AS n_raw,
        |  nfc_normalize(r) AS norm_text,
        |  CAST(length(nfc_normalize(r)) AS INT) AS n_norm,
        |  strip_accents(nfc_normalize(r)) AS folded
        |FROM raw ORDER BY doc_id""".stripMargin,

    "q_pipeline_stats" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
        |  FROM documents),
        |doc_sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [array_to_string(words[i:i+7], ' ') FOR i IN range(1, len(words) - 6)])) AS sh
        |  FROM w),
        |bench_sh AS (SELECT DISTINCT sh FROM doc_sh WHERE doc_id < 20),
        |contaminated AS (
        |  SELECT DISTINCT d.doc_id FROM doc_sh d JOIN bench_sh b USING (sh)),
        |clean AS (
        |  SELECT * FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |ranked AS (
        |  SELECT doc_id, text, row_number() OVER (
        |    PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |    ORDER BY doc_id) = 1 AS is_canonical
        |  FROM clean),
        |q AS (
        |  SELECT is_canonical,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS punct,
        |    length(text) AS n_chars,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        w -> w IN ('the','a','of','to','and','in','is','it'))) AS stop_hits
        |  FROM ranked),
        |g AS (
        |  SELECT is_canonical, n_words,
        |    (n_words BETWEEN 5 AND 100000)
        |      AND (CASE WHEN n_chars > 0 THEN round(CAST(punct AS DOUBLE) / n_chars, 4) ELSE 0.0 END < 0.3)
        |      AND (CASE WHEN n_words > 0 THEN round(CAST(stop_hits AS DOUBLE) / n_words, 4) ELSE 0.0 END > 0.0)
        |      AS quality_ok
        |  FROM q)
        |SELECT CAST(count(*) AS BIGINT) AS n_clean,
        |  CAST(sum(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  CAST(sum(CASE WHEN is_canonical AND quality_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN is_canonical AND quality_ok THEN n_words ELSE 0 END) AS BIGINT) AS kept_words
        |FROM g""".stripMargin,

    "q_decontam" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
        |  FROM documents),
        |doc_sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [array_to_string(words[i:i+7], ' ') FOR i IN range(1, len(words) - 6)])) AS sh
        |  FROM w),
        |bench_sh AS (
        |  SELECT DISTINCT sh FROM doc_sh WHERE doc_id < 20),
        |hits AS (
        |  SELECT d.doc_id, count(*) AS n_hits
        |  FROM doc_sh d JOIN bench_sh b USING (sh) GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |       coalesce(h.n_hits, 0) >= 1 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_jaccard_pairs" ->
      """WITH sh_all AS (
        |  SELECT doc_id AS id, unnest(list_distinct(sh_list)) AS sh FROM (
        |    SELECT doc_id, [array_to_string(words[i:i+1], ' ')
        |                    FOR i IN range(1, len(words) - 0)] AS sh_list
        |    FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
        |          FROM documents))),
        |sh AS (
        |  SELECT id, sh FROM sh_all WHERE sh IN (
        |    SELECT sh FROM sh_all GROUP BY sh HAVING count(*) <= 64)),
        |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       round(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
        |FROM pairs JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
        |WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2""".stripMargin,

    "q_cosine_topk" -> cosineTopkSql,
    "q_pq_exact" -> cosineTopkSql,
    "q_ivfpq_exact" -> cosineTopkSql,

    // PAIR-RECHECK oracles (VERDICT_r05 next-round #2): the emitted
    // candidate pairs are hash-family-specific, but their MEASURES are
    // not — the oracle reads the pair list back from the Verify output
    // parquet (__VERIFY_OUT__ is substituted by Verify with its absolute
    // outDir at dump time) and independently recomputes each pair's
    // measure from the source tables, so the distributed shingle/jaccard
    // and cosine math is hash-checked on the exact rows the engine emitted.
    "q_minhash_jaccard" ->
      """WITH cand AS (
        |  SELECT id_a, id_b FROM '__VERIFY_OUT__/q_minhash_jaccard/*.parquet'),
        |ids AS (SELECT id_a AS id FROM cand UNION SELECT id_b FROM cand),
        |sh AS (
        |  SELECT doc_id AS id, unnest(list_distinct(
        |    [array_to_string(words[i:i+2], ' ') FOR i IN range(1, len(words) - 1)])) AS sh
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
        |        FROM documents WHERE doc_id IN (SELECT id FROM ids))),
        |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT c.id_a, c.id_b, count(*) AS n_inter
        |  FROM cand c JOIN sh a ON a.id = c.id_a
        |              JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
        |  GROUP BY 1, 2)
        |SELECT c.id_a, c.id_b,
        |       round(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
        |             / (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)), 6) AS jaccard
        |FROM cand c LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        |JOIN sizes sa ON sa.id = c.id_a JOIN sizes sb ON sb.id = c.id_b""".stripMargin,

    "q_ann_lsh" ->
      """WITH cand AS (
        |  SELECT id_a, id_b FROM '__VERIFY_OUT__/q_ann_lsh/*.parquet')
        |SELECT c.id_a, c.id_b,
        |       round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |       / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
        |FROM cand c JOIN embeddings a ON a.vec_id = c.id_a
        |            JOIN embeddings b ON b.vec_id = c.id_b""".stripMargin,

    // the approximate ANN configs return TRUE cosines (exact rerank), so
    // their emitted (query, neighbor) rows are score-recheckable even
    // though the candidate SET is codebook-specific: recompute each row's
    // cosine from the embeddings table and re-rank within the emitted
    // rows (rank among the emitted top-k equals the engine's rank —
    // same ordering, same tie-break)
    "q_pq_topk" -> topkRecheckSql("q_pq_topk"),
    "q_ivfpq_topk" -> topkRecheckSql("q_ivfpq_topk"),

    // entry() is fully deterministic: it extracts EVERY page of the
    // seeded synthetic web directly (no crawl/robots stage here — the
    // generator emits one /private/secretN page per host, which is why
    // secret4 appears; robots semantics are proven separately by the
    // sequential-oracle parity suites). The document set and per-document
    // span counts from the real HTML extractor therefore pin as a golden
    // table, catching silent extractor drift between rounds
    "q_crawl_documents" ->
      """SELECT doc_id, CAST(n_spans AS INT) AS n_spans FROM (VALUES
        |  ('https://www.host0.example0.com/p0.html', 59),
        |  ('https://www.host0.example0.com/p1.html', 60),
        |  ('https://www.host0.example0.com/p2.html', 38),
        |  ('https://www.host0.example0.com/p3.html', 52),
        |  ('https://www.host0.example0.com/p4.html', 48),
        |  ('https://www.host0.example0.com/private/secret4.html', 1),
        |  ('https://www.host1.example1.com/p0.html', 39),
        |  ('https://www.host1.example1.com/p1.html', 37),
        |  ('https://www.host1.example1.com/p2.html', 36),
        |  ('https://www.host1.example1.com/p3.html', 25),
        |  ('https://www.host1.example1.com/p4.html', 58),
        |  ('https://www.host1.example1.com/private/secret4.html', 1)
        |) AS t(doc_id, n_spans) ORDER BY doc_id""".stripMargin,

    // the PDF corpus is a DETERMINISTIC function of the fixture spec, so
    // the oracle derives the expected span structure independently from
    // the same spec: nPages = 2 + i%3; one Section per page; 2 body
    // blocks per page; 4 text spans per page; image-layout docs
    // (i%8 == 6) add one Media.Image span per page; the shared running
    // header and page numbers must be REMOVED (has_decoration false).
    // A rows-only check once hid a total text wipe-out here (the old
    // digit-only-varying fixtures were decoration-classified wholesale) —
    // this pins every structural count
    "q_pdf_documents" ->
      """WITH f AS (
        |  SELECT CAST(i AS INT) AS i, CAST(2 + i % 3 AS INT) AS np,
        |         CAST(CASE WHEN i % 8 = 6 THEN 2 + i % 3 ELSE 0 END AS INT) AS nm
        |  FROM range(0, 16) t(i))
        |SELECT 'pdf_' || i AS doc_id, 'Fixture ' || i AS title,
        |       CAST(4 * np + nm AS INT) AS n_spans,
        |       np AS n_sections,
        |       CAST(2 * np AS INT) AS n_blocks,
        |       nm AS n_media,
        |       false AS has_decoration
        |FROM f ORDER BY doc_id""".stripMargin,

    // the media corpus is synthesized from pure integer formulas of
    // doc_id (pixelValue / sampleValue / framePixel), then REALLY encoded
    // (PNG/WAV/GIF) and REALLY decoded by the JDK codecs — so recomputing
    // each mean from the formulas verifies the whole encode→decode→
    // feature path; n_bytes (container framing) rides through
    // recheck-style
    "q_media_features" ->
      """WITH out AS (
        |  SELECT media_id, n_bytes
        |  FROM '__VERIFY_OUT__/q_media_features/*.parquet'),
        |params AS (
        |  SELECT doc_id AS id, CAST(16 + doc_id % 64 AS INT) AS w,
        |         CAST(16 + doc_id % 48 AS INT) AS h, doc_id % 3 AS m3,
        |         64 + doc_id % 128 AS frames, 4 + doc_id % 6 AS vframes
        |  FROM documents),
        |img AS (
        |  SELECT p.id, avg(CAST((p.id * 31 + 7 * x.i + 13 * y.i) % 256 AS DOUBLE)) AS mean
        |  FROM params p, range(0, 80) x(i), range(0, 64) y(i)
        |  WHERE p.m3 = 0 AND x.i < p.w AND y.i < p.h
        |  GROUP BY 1),
        |aud AS (
        |  SELECT p.id,
        |         avg(CAST((p.id * 2654435761 + s.i * 40503) % 65536 - 32768 AS DOUBLE)) AS mean
        |  FROM params p, range(0, 192) s(i)
        |  WHERE p.m3 = 1 AND s.i < p.frames
        |  GROUP BY 1),
        |vid AS (
        |  SELECT p.id,
        |         avg(CAST(((p.id * 131 + f.i) * 31 + 7 * x.i + 13 * y.i) % 256 AS DOUBLE)) AS mean
        |  FROM params p, range(0, 10) f(i), range(0, 80) x(i), range(0, 64) y(i)
        |  WHERE p.m3 = 2 AND f.i < p.vframes AND x.i < p.w AND y.i < p.h
        |  GROUP BY 1)
        |SELECT o.media_id,
        |  CASE p.m3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  o.n_bytes,
        |  CAST(CASE p.m3 WHEN 1 THEN 8000 ELSE p.w END AS INT) AS width,
        |  CAST(CASE p.m3 WHEN 1 THEN 1 ELSE p.h END AS INT) AS height,
        |  round(CASE p.m3 WHEN 0 THEN i.mean WHEN 1 THEN a.mean ELSE v.mean END, 4) AS mean_byte
        |FROM out o JOIN params p ON p.id = o.media_id
        |LEFT JOIN img i ON i.id = p.id
        |LEFT JOIN aud a ON a.id = p.id
        |LEFT JOIN vid v ON v.id = p.id
        |ORDER BY o.media_id""".stripMargin,

    "q_exact_substr" ->
      """WITH out AS (
        |  SELECT doc_id, start_tok, len_tok, owner_id, owner_start
        |  FROM '__VERIFY_OUT__/q_exact_substr/*.parquet'),
        |toks AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t
        |  FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM out UNION SELECT owner_id FROM out))
        |SELECT o.doc_id, o.start_tok, o.len_tok, o.owner_id, o.owner_start,
        |       md5(array_to_string(d.t[o.start_tok + 1 : o.start_tok + o.len_tok], ' ')) AS win_md5,
        |       md5(array_to_string(w.t[o.owner_start + 1 : o.owner_start + o.len_tok], ' ')) AS owner_md5
        |FROM out o JOIN toks d ON d.doc_id = o.doc_id
        |           JOIN toks w ON w.doc_id = o.owner_id""".stripMargin,

    "q_simhash_pairs" ->
      """WITH out AS (
        |  SELECT id_a, id_b, sim_a, sim_b
        |  FROM '__VERIFY_OUT__/q_simhash_pairs/*.parquet')
        |SELECT id_a, id_b, sim_a, sim_b,
        |       CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
        |FROM out""".stripMargin,

    "q_winnow_jaccard" ->
      """WITH cand AS (
        |  SELECT id_a, id_b FROM '__VERIFY_OUT__/q_winnow_jaccard/*.parquet'),
        |ids AS (SELECT id_a AS id FROM cand UNION SELECT id_b FROM cand),
        |grams AS (
        |  SELECT id, unnest(list_distinct(
        |    [substring(n, i, 8) FOR i IN range(1, len(n) - 6)])) AS sh
        |  FROM (SELECT doc_id AS id,
        |               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS n
        |        FROM documents WHERE doc_id IN (SELECT id FROM ids))),
        |sizes AS (SELECT id, count(*) AS n_sh FROM grams GROUP BY 1),
        |inter AS (
        |  SELECT c.id_a, c.id_b, count(*) AS n_inter
        |  FROM cand c JOIN grams a ON a.id = c.id_a
        |              JOIN grams b ON b.id = c.id_b AND b.sh = a.sh
        |  GROUP BY 1, 2)
        |SELECT c.id_a, c.id_b,
        |       round(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
        |             / (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)), 6) AS jaccard
        |FROM cand c LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        |JOIN sizes sa ON sa.id = c.id_a JOIN sizes sb ON sb.id = c.id_b""".stripMargin,

    "q_bpe_tokens" ->
      """WITH out AS (
        |  SELECT doc_id, n_bpe_tokens
        |  FROM '__VERIFY_OUT__/q_bpe_tokens/*.parquet')
        |SELECT d.doc_id,
        |       CAST(len(list_filter(string_split_regex(lower(d.text), '\s+'),
        |                            x -> x <> '')) AS BIGINT) AS n_words,
        |       o.n_bpe_tokens,
        |       array_to_string(list_filter(string_split_regex(lower(d.text), '\s+'),
        |                                   x -> x <> ''), ' ') AS text_rt
        |FROM out o JOIN documents d ON d.doc_id = o.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |       / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 200 AND b.vec_id < 200
        |  AND list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.3""".stripMargin,

    "q_export_stats" ->
      """WITH prepared AS (
        |  SELECT 'https://' || source || '.example.com/d' || CAST(doc_id AS VARCHAR) AS doc_url,
        |         source || '.example.com' AS website, lang
        |  FROM documents WHERE lang = 'en'),
        |gated AS (
        |  SELECT website FROM prepared GROUP BY 1 HAVING count(*) >= 10)
        |SELECT p.website, CASE
        |    WHEN ('0x' || substring(md5(p.doc_url), 1, 4))::INT % 10 <= 7 THEN 'train'
        |    WHEN ('0x' || substring(md5(p.doc_url), 1, 4))::INT % 10 = 8 THEN 'valid'
        |    ELSE 'test' END AS split,
        |  count(*) AS n_docs
        |FROM prepared p JOIN gated g ON p.website = g.website
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_legacy_export_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS BIGINT) AS n_unique,
        |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_words
        |FROM documents WHERE doc_id < 200""".stripMargin,

    "q_dedup_clusters" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE a.vec_id < 200 AND b.vec_id < 200
        |    AND list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach AS (
        |  WITH RECURSIVE r(a, b) AS (
        |    SELECT src, dst FROM edges
        |    UNION
        |    SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src)
        |  SELECT a, b FROM r)
        |SELECT a AS id, least(a, min(b)) AS cluster FROM reach
        |GROUP BY a ORDER BY id""".stripMargin,

    "q_neardup_export" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE a.vec_id < 200 AND b.vec_id < 200
        |    AND list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach AS (
        |  WITH RECURSIVE r(a, b) AS (
        |    SELECT src, dst FROM edges
        |    UNION
        |    SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src)
        |  SELECT a, b FROM r),
        |cl AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a),
        |canon AS (
        |  SELECT d.* FROM documents d LEFT JOIN cl ON d.doc_id = cl.id
        |  WHERE d.doc_id < 200 AND COALESCE(cl.cluster, d.doc_id) = d.doc_id),
        |prepared AS (
        |  SELECT 'https://' || source || '.example.com/d' || CAST(doc_id AS VARCHAR) AS doc_url,
        |         source || '.example.com' AS website, lang
        |  FROM canon WHERE lang = 'en'),
        |gated AS (
        |  SELECT website FROM prepared GROUP BY 1 HAVING count(*) >= 2)
        |SELECT p.website, CASE
        |    WHEN ('0x' || substring(md5(p.doc_url), 1, 4))::INT % 10 <= 7 THEN 'train'
        |    WHEN ('0x' || substring(md5(p.doc_url), 1, 4))::INT % 10 = 8 THEN 'valid'
        |    ELSE 'test' END AS split,
        |  count(*) AS n_docs
        |FROM prepared p JOIN gated g ON p.website = g.website
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_ivf_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_sum(list_transform(list_zip(q.embedding, c.embedding),
        |             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |         / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |          * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cs
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, cs,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY cs DESC, neighbor_id ASC) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,

    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |       CAST(16 + doc_id % 64 AS INT) AS width,
        |       CAST(16 + doc_id % 48 AS INT) AS height
        |FROM documents""".stripMargin,

    "q_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         16 + doc_id % 64 AS w, 16 + doc_id % 48 AS h
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT media_id,
        |  CAST(CASE WHEN w <= 24 AND h <= 24 THEN w
        |    ELSE GREATEST(1, FLOOR(w * LEAST(24.0 / w, 24.0 / h))) END AS INT) AS out_w,
        |  CAST(CASE WHEN w <= 24 AND h <= 24 THEN h
        |    ELSE GREATEST(1, FLOOR(h * LEAST(24.0 / w, 24.0 / h))) END AS INT) AS out_h
        |FROM m""".stripMargin
  )
}
