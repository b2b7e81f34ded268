package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-self-trained bigram language-model typicality scoring — the
  * perplexity-style quality filter large-scale pipelines run before
  * training (CCNet, Wenzek et al. LREC 2020, filters on LM perplexity;
  * Gopher, Rae et al. 2021, flags documents unlike the corpus). With no
  * external clean LM available offline, the model trains on the corpus
  * itself, so the score reads as TYPICALITY: gibberish, boilerplate-free
  * spam, and wrong-language documents land in the low tail.
  *
  * Deterministic by construction and fully SQL-recomputable (the driver
  * oracle re-derives counts, vocabulary, bigram table, and every
  * document's score from the same parquet table):
  *
  *  - tokens: whitespace-split lowercased words — [[Bpe.normalizeWords]]
  *    is the ONE tokenizer for unigram counting, bigram counting, and
  *    scoring alike (Locale.ROOT lowercasing agrees with the oracle's
  *    locale-independent SQL `lower`);
  *  - vocabulary: words with count ≥ `minWordCount`, capped to the
  *    `maxVocab` most frequent (ties broken lexicographically); the rest
  *    map to `<unk>` — and the literal token "<unk>" is itself excluded
  *    from the vocabulary so corpus text can never collide with the
  *    class;
  *  - bigram table: mapped-token bigrams with count ≥ `minBigramCount`,
  *    capped to the `maxBigrams` most frequent (same tie-break);
  *  - probability: add-k smoothing over the mapped vocabulary,
  *    P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V) with V = |vocab| + 1;
  *    when w2 is `<unk>` the class probability spreads over the distinct
  *    out-of-vocabulary types (ln P − ln |OOV|) — the standard unk-class
  *    correction (KenLM's OOV handling; without it a gibberish document
  *    whose tokens all map to `<unk>` scores HIGH, because the corpus's
  *    concentrated unk→unk transitions look deceptively predictable);
  *  - score: mean ln P over the document's bigrams (0.0 for documents
  *    with fewer than two tokens).
  *
  * Scale shape: training is two count aggregations with map-side combine
  * (words, then bigram pairs emitted per partition); ONLY the
  * threshold-and-capped tables are collected — driver and broadcast
  * state are hard-bounded by `maxVocab` + `maxBigrams` regardless of
  * corpus size (the dropped long tail is smoothing-floored anyway, which
  * is the standard back-off economics). Scoring is a broadcast-model
  * mapPartitions — no shuffle.
  */
object NgramLm {

  val Unk = "<unk>"

  /** Broadcastable model: mapped-unigram counts, the bigram table, and
    * the smoothed-vocabulary size.
    */
  final case class LmModel(
      uniCount: Map[String, Long], // mapped counts: vocab words + <unk>
      bigramCount: Map[(String, String), Long],
      vocabSizeWithUnk: Long,
      oovTypes: Long,
      k: Double) {

    /** Vocabulary membership — uniCount's keys ARE vocab ∪ {<unk>} (the
      * literal token "<unk>" is excluded from the vocabulary at train
      * time, so a corpus containing it as text folds into the class).
      */
    private def mapped(w: String): String =
      if (w != Unk && uniCount.contains(w)) w else Unk

    /** Mean ln P over a document's bigrams; (nWords, nBigrams, score). */
    def score(text: String): (Long, Long, Double) = {
      val words = Bpe.normalizeWords(text)
      if (words.length < 2) return (words.length.toLong, 0L, 0.0)
      val lnOov = math.log(math.max(1L, oovTypes).toDouble)
      var sum = 0.0
      var i = 0
      var prev = mapped(words(0))
      while (i < words.length - 1) {
        val cur = mapped(words(i + 1))
        val cBi = bigramCount.getOrElse((prev, cur), 0L)
        val cUni = uniCount.getOrElse(prev, 0L)
        sum += math.log((cBi + k) / (cUni + k * vocabSizeWithUnk))
        if (cur == Unk) sum -= lnOov // spread the class over its members
        prev = cur
        i += 1
      }
      (words.length.toLong, (words.length - 1).toLong,
        sum / (words.length - 1))
    }
  }

  /** Train the bigram model distributedly; only the capped tables reach
    * the driver.
    */
  def train(docs: DataFrame, textCol: String,
      minWordCount: Long = 5L, maxVocab: Int = 32768,
      minBigramCount: Long = 2L, maxBigrams: Int = 1 << 18,
      k: Double = 0.1): LmModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE tokenizer everywhere (Bpe.normalizeWords) — unigram counting,
    // bigram counting, and scoring must see identical tokens. Spread off a
    // narrow scan so tokenization + map-side combine run at full width.
    val toks = Par.spread(docs.select(col(textCol).as("t"))).as[String]
      .mapPartitions(_.flatMap(Bpe.normalizeWords)).toDF("w")
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c")).persist()
    // the literal token "<unk>" never enters the vocabulary — it would
    // collide with the OOV class and its pooled count
    val vocabRows = uni.filter(col("c") >= minWordCount && col("w") =!= Unk)
      .orderBy(col("c").desc, col("w")).limit(maxVocab)
      .as[(String, Long)].collect()
    val vocab = vocabRows.iterator.map(_._1).toSet
    // mapped-unigram counts: vocab words keep their count; every OOV
    // occurrence pools into <unk> (derived as total - vocab mass, so no
    // second corpus pass)
    val Seq(total, types) = uni.agg(sum(col("c")), count(lit(1)))
      .head().toSeq.map(v => v.asInstanceOf[Long])
    val unkCount = total - vocabRows.iterator.map(_._2).sum
    val uniCount = vocabRows.toMap + (Unk -> unkCount)
    val oovTypes = types - vocab.size
    uni.unpersist()
    // bigram counts over mapped tokens: pairs emitted partition-locally
    // against the broadcast vocab, counted with map-side combine
    val bcVocab = spark.sparkContext.broadcast(vocab)
    val pairs = Par.spread(docs.select(col(textCol).as("t"))).as[String]
      .mapPartitions { rows =>
        val v = bcVocab.value
        rows.flatMap { t =>
          val ws = Bpe.normalizeWords(t)
          if (ws.length < 2) Iterator.empty
          else (0 until ws.length - 1).iterator.map { j =>
            (if (v.contains(ws(j))) ws(j) else Unk,
              if (v.contains(ws(j + 1))) ws(j + 1) else Unk)
          }
        }
      }.toDF("w1", "w2")
    val bigramCount = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minBigramCount)
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(maxBigrams)
      .as[(String, String, Long)].collect()
      .iterator.map { case (a, b, c) => (a, b) -> c }.toMap
    LmModel(uniCount, bigramCount, vocab.size + 1L, oovTypes, k)
  }

  /** Score every document under a broadcast model: (id, n_words,
    * n_bigrams, avg_logprob rounded to 6 places). NO SHUFFLE — the model
    * broadcasts and the scorer is a single Scala UDF, so the per-document
    * hot path that touches all 100 TB stays exchange-free (PlanSpec pins
    * it). The id keeps its NATIVE type (URL strings on the crawl
    * documents table, longs on the sf tables) — same contract as
    * packSequences / exactSubstrMatches; a forced long cast would
    * silently null string ids (ADVICE r06).
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      model: LmModel): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    // one UDF returning the (n_words, n_bigrams, score) struct; Spark's
    // CollapseProject keeps non-cheap UDFs single-evaluation when the
    // struct's fields are projected out
    val scoreUdf = udf { (t: String) => bc.value.score(t) }
    docs.select(col(idCol).as("id"), scoreUdf(col(textCol)).as("__s"))
      .select(col("id"),
        col("__s._1").as("n_words"),
        col("__s._2").as("n_bigrams"),
        // round via the SQL function so the rounding mode is bit-identical
        // with every other oracle-compared double in this repo
        round(col("__s._3"), 6).as("avg_logprob"))
  }

  /** Train-and-score in one call (the query shape). */
  def typicality(docs: DataFrame, idCol: String, textCol: String,
      minWordCount: Long = 5L, maxVocab: Int = 32768,
      minBigramCount: Long = 2L, maxBigrams: Int = 1 << 18,
      k: Double = 0.1): DataFrame =
    scoreDocs(docs, idCol, textCol,
      train(docs, textCol, minWordCount, maxVocab, minBigramCount,
        maxBigrams, k))
}
