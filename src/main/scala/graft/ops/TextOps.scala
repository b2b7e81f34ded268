package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, built
  * exclusively from codegen'd `org.apache.spark.sql.functions` so they stay
  * inside whole-stage codegen (no UDFs on the hot path) and their semantics
  * are DuckDB-oracle-expressible.
  *
  * These generalize the reference's per-block analysis (word/char stats,
  * `wordslab.nlptextdoc/NLPTextAnalyzer.cs:205-255`; language id `:45-59`;
  * stable hashing `:269-274`) to whole-corpus Dataset operators.
  */
object TextOps {

  /** Whitespace word count, identical to reference word semantics
    * (maximal non-whitespace runs).
    */
  def wordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  private val StopWords = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  /** Quality features + accept flag (Gopher-style length/punct/stopword
    * gates; the concrete thresholds are pipeline policy, not magic).
    */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = wordCount(t)
    val punct = size(regexp_extract_all(t, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val digits = size(regexp_extract_all(t, lit("[0-9]"), lit(0)))
    val stopHits = size(filter(split(lower(trim(t)), "\\s+"),
      w => array_contains(typedLit(StopWords), w)))
    df.withColumn("n_words", words)
      .withColumn("avg_word_len",
        when(words > 0, round((length(t) - words + 1).cast("double") / words, 4))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(length(t) > 0, round(punct.cast("double") / length(t), 4)).otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(length(t) > 0, round(digits.cast("double") / length(t), 4)).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(words > 0, round(stopHits.cast("double") / words, 4)).otherwise(lit(0.0)))
      .withColumn("quality_ok",
        words.between(5, 100000) && col("punct_ratio") < 0.3 && col("stopword_ratio") > 0.0)
  }

  /** Deterministic, engine-portable document fingerprint: md5 of the
    * whitespace-normalized lowercased text. Used for exact near-duplicate
    * detection across engines (the reference's xxHash64 dictionary analog,
    * in a form DuckDB can reproduce).
    */
  /** PII scrubbing for training corpora: emails and IPv4 literals are
    * replaced with typed placeholders. Pure `regexp_replace` chain —
    * codegen'd, no UDF — with RE2-portable patterns (the DuckDB oracle
    * runs the same regexes with the 'g' flag). Deliberately conservative:
    * phone formats vary too much across locales for a portable regex, so
    * a production build extends the chain rather than risking false
    * positives here.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")

  /** Repetition scoring (the Gopher-style duplicate-fraction family):
    * fraction of tokens that are repeats of an earlier token in the same
    * document. High values flag boilerplate/spam for the quality gate.
    * Whitespace tokenization after trim, so the DuckDB oracle
    * (`string_split_regex(trim(...), '\s+')` + `list_distinct`) mirrors
    * it exactly.
    */
  def dupTokenFrac(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    when(n > 0, (n - size(array_distinct(toks))).cast("double") / n)
      .otherwise(lit(0.0))
  }

  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Portable 0..9 hash bucket (md5 hex prefix → int), the seeded
    * replacement for the reference's unseeded Fisher-Yates 80/10/10 split
    * (`parquet/HuggingFaceDatasetBuilder.cs:427-440`, SURVEY.md O5).
    */
  def hashBucket10(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") % 10

  /** train/valid/test 80/10/10 split assignment. */
  def splitAssign(key: Column): Column = {
    val b = hashBucket10(key)
    when(b <= 7, lit("train")).when(b === 8, lit("valid")).otherwise(lit("test"))
  }

  /** Cheap n-gram-profile language guess, SQL-expressible (stopword hit
    * counting per language). Coarser than graft.core.LangId (used in the
    * crawl path); this one exists as a *relational* operator whose oracle
    * is plain SQL.
    */
  def langGuess(text: Column): Column = {
    def hits(ws: Seq[String]): Column =
      size(filter(split(lower(trim(text)), "\\s+"),
        w => array_contains(typedLit(ws), w)))
    val en = hits(Seq("the", "and", "of", "is", "in"))
    val fr = hits(Seq("le", "la", "et", "est", "les"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    when(en >= fr && en >= de && en > 0, lit("en"))
      .when(fr >= de && fr > 0, lit("fr"))
      .when(de > 0, lit("de"))
      .otherwise(lit("?"))
  }

  /** Language-balanced resampling — the multilingual-rebalancing step of a
    * CC-style pipeline (cf. Wenzek et al. 2020; Xue et al. 2021 sampling
    * temperature): given target SHARES per language, downsample each
    * language deterministically so the kept corpus matches the target mix
    * at the largest achievable size. No upsampling: the output size is
    * N' = min over targeted languages of n_l / t_l, and language l keeps
    * each doc with probability t_l · N' / n_l (≤ 1 by construction), via
    * the portable md5-prefix uniform — the same seeded-hash trick as the
    * 80/10/10 split, so the whole operator (counts, rates, keep decision)
    * is re-derivable in plain SQL. Languages absent from `targetShares`
    * keep nothing. Only the per-language count map touches the driver
    * (bounded by the language inventory, never by rows).
    *
    * Output: input rows + `kept` flag.
    */
  def langRebalance(df: DataFrame, idCol: String, langCol: String,
      targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.values.forall(t => t > 0 && t <= 1.0)
      && math.abs(targetShares.values.sum - 1.0) < 1e-9,
      "targetShares must be positive and sum to 1")
    val counts = df.groupBy(col(langCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targetShares.filter { case (l, _) => counts.getOrElse(l, 0L) > 0 }
    require(present.nonEmpty, "no targeted language present in the corpus")
    val nPrime = present.map { case (l, t) => counts(l) / t }.min
    val keepRate = present.map { case (l, t) => l -> t * nPrime / counts(l) }
    // uniform in [0, 1): md5 hex prefix (16 bits) / 65536 — mirrored by the
    // oracle bit for bit
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("double") / 65536.0
    val rate = keepRate.foldLeft(lit(0.0)) { case (acc, (l, r)) =>
      when(col(langCol) === l, lit(r)).otherwise(acc)
    }
    df.withColumn("kept", u < rate)
  }

  /** Overlapping token-window chunking — the oversize-document companion to
    * [[packSequences]] (and the retrieval-indexing shape): each document
    * splits into windows of `maxTokens` whitespace tokens advancing by
    * stride = maxTokens − overlap, so consecutive chunks share `overlap`
    * tokens of context. A document of ≤ maxTokens yields one chunk; every
    * chunk past the first contributes at least one new token. Pure codegen
    * expressions (split/sequence/posexplode/slice), fully re-derivable in
    * SQL — chunk boundaries, sizes, and the md5 of every chunk's text.
    *
    * Output: (id, chunk_index, start_tok, chunk_tokens, chunk_md5).
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    // keep docs with any non-whitespace content — rlike("\\S") evaluates
    // identically in Spark and the DuckDB oracle (trim() alone strips only
    // spaces in BOTH engines, so a tabs/newlines-only doc would diverge)
    val toks = df
      .filter(col(textCol).rlike("\\S"))
      .select(col(idCol).as("id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
    toks
      .select(col("id"), col("toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("toks")) - overlap - 1, lit(0)), lit(stride))))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "start_tok")
      .withColumn("chunk_tokens",
        least(lit(maxTokens), size(col("toks")) - col("start_tok")))
      .withColumn("chunk_md5",
        md5(array_join(slice(col("toks"), col("start_tok") + 1, lit(maxTokens)), " ")))
      .select("id", "chunk_index", "start_tok", "chunk_tokens", "chunk_md5")
  }

  /** Greedy sequence packing — the context-window fill step between the
    * cleaning pipeline and training: documents are grouped into bins whose
    * summed whitespace-token counts stay ≤ `capacity`, maximizing fill.
    *
    * Exact bin packing is NP-hard and inherently sequential, so the
    * standard distributed compromise applies: FIRST-FIT-DECREASING within
    * each hash-routed partition. Deterministic for a given
    * (ids, capacity, parts): ids route by `hash(id) mod parts` (plain
    * column repartition — NOT repartition-on-pmod, whose re-hash collapses
    * buckets and skews partitions ~3x), docs sort by (n_tokens desc,
    * id-string), bins are partition-local and numbered
    * `partition << 32 | index`. The id keeps its native type (URL strings
    * on the crawl documents table, longs on the sf tables). Oversize docs
    * (> capacity tokens) become single-doc bins flagged by `fits = false`
    * (callers chunk or drop them); every other bin satisfies the capacity
    * constraint by construction — and the constraint itself is
    * re-derivable by an external engine from just the emitted (id, bin_id)
    * assignment, which is what the q_pack_sequences recheck oracle does.
    *
    * Output: (id, n_tokens, bin_id, bin_total, bin_docs, fits) — the bin
    * aggregates ride a window over bin_id, so the packing pass runs once.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capacity: Int, numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val routed = df
      .select(col(idCol).as("id"),
        wordCount(col(textCol)).cast("long").as("n_tokens"))
      .repartition(parts, col("id"))
    val outSchema = StructType(routed.schema.fields :+
      StructField("bin_id", LongType, nullable = false))
    val packed = routed.rdd.mapPartitionsWithIndex { (pid, it) =>
      val docs = it.toArray
        .sortBy(r => (-r.getLong(1), String.valueOf(r.get(0))))
      // first-fit-decreasing: remaining capacity per open bin
      val room = scala.collection.mutable.ArrayBuffer.empty[Long]
      docs.iterator.map { r =>
        val n = r.getLong(1)
        var b = 0
        while (b < room.length && room(b) < n) b += 1
        if (b == room.length) room += capacity.toLong
        room(b) = if (n > capacity) -1L else room(b) - n // oversize bin closes
        Row(r.get(0), n, (pid.toLong << 32) | b.toLong)
      }
    }
    val w = Window.partitionBy(col("bin_id"))
    spark.createDataFrame(packed, outSchema)
      .withColumn("bin_total", sum(col("n_tokens")).over(w))
      .withColumn("bin_docs", count(lit(1)).over(w))
      .withColumn("fits", col("bin_total") <= capacity)
      .select("id", "n_tokens", "bin_id", "bin_total", "bin_docs", "fits")
  }
}
