package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Byte-pair-encoding tokenization (Sennrich et al. 2016, ACL — public
  * material): the token-counting step an LLM data pipeline runs to budget
  * and filter documents in *model* tokens rather than words.
  *
  * Production shape, mirrored here: the merge table trains on a bounded
  * SAMPLE of the corpus (real tokenizers train once on a subset, then
  * freeze), driver-side over the sample's word-frequency map; application
  * is embarrassingly parallel — the ranks map broadcasts and each
  * partition tokenizes its rows with a per-task word memo (natural-language
  * word frequency is Zipfian, so the memo's hit rate is high). No shuffle
  * anywhere in the apply path.
  *
  * Determinism: merge ties break lexicographically, the training sample is
  * selected by xxhash64 order — same corpus, same merges, every run.
  */
object Bpe {

  /** End-of-word marker (kept distinct from any single char). */
  val Eow = "</w>"

  /** Train `numMerges` merges from a word-frequency map (classic corpus-
    * level BPE: repeatedly merge the most frequent adjacent symbol pair;
    * ties break on the lexicographically smallest pair).
    */
  def trainMerges(wordFreq: Map[String, Long],
      numMerges: Int): Vector[(String, String)] = {
    var vocab: Map[Vector[String], Long] = wordFreq
      .groupMapReduce { case (w, _) => w.map(_.toString).toVector :+ Eow }(_._2)(_ + _)
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        var j = 0
        while (j + 1 < syms.length) {
          pairCounts((syms(j), syms(j + 1))) += f
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += best
        vocab = vocab.groupMapReduce { case (syms, _) =>
          mergePair(syms, best) }(_._2)(_ + _)
        i += 1
      }
    }
    merges.result()
  }

  /** One merge applied to every occurrence in a symbol sequence. */
  private[ops] def mergePair(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += (pair._1 + pair._2)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Tokenize one word under the trained ranks: repeatedly merge the
    * LOWEST-ranked pair present (all its occurrences), until none applies
    * — the standard greedy BPE segmenter.
    */
  def tokenizeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = word.map(_.toString).toVector :+ Eow
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j + 1 < syms.length) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (bestPair == null) continue = false
      else syms = mergePair(syms, bestPair)
    }
    syms
  }

  /** Train merges on a deterministic sample of a text column: word
    * frequencies of the `sampleDocs` rows with the smallest
    * xxhash64(text), counted distributedly, merged on the driver (the
    * sample's vocabulary is bounded; production tokenizers train exactly
    * this way — on a frozen subset).
    */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      sampleDocs: Int = 256): Vector[(String, String)] = {
    val sample = corpus.select(col(textCol).as("t"))
      .withColumn("h", xxhash64(col("t")))
      .orderBy(col("h"), col("t")).limit(sampleDocs)
    val wordFreq = sample
      .select(explode(split(lower(trim(col("t"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trainMerges(wordFreq, numMerges)
  }

  /** The ONE executor-side text normalization, shared by both apply paths
    * so they can never drift. Locale.ROOT: train() lowercases via Spark's
    * locale-independent lower(); a default-locale toLowerCase would
    * disagree on e.g. Turkish-locale JVMs (I -> dotless ı) and miss every
    * rank. Deliberately NO String.trim: split + empty-filter already
    * handles \s whitespace at the edges, and Java trim additionally
    * strips control chars <= U+0020 that SQL `lower(text)` + `split`
    * (Spark and the DuckDB oracles alike) keep inside the first/last
    * token — trimming here would silently diverge from every SQL twin.
    */
  private[ops] def normalizeWords(t: String): Array[String] =
    Option(t).getOrElse("")
      .toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)

  /** Per-document BPE token counts: (id, n_words, n_bpe_tokens). The
    * ranks broadcast; a per-task word→tokens memo exploits Zipfian word
    * reuse. Partition-parallel map, no shuffle.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Vector[(String, String)]): DataFrame =
    applyBpe(df, idCol, textCol, merges, withRoundTrip = false)
      .drop("text_rt")

  /** [[tokenCounts]] plus a detokenization ROUND-TRIP column: `text_rt` is
    * each word rebuilt by concatenating its BPE tokens (Eow stripped) and
    * re-joining with single spaces. BPE merges only ever fuse adjacent
    * symbols, so token concatenation must reproduce the normalized word
    * EXACTLY — emitting the reconstruction makes that losslessness
    * verifiable by any SQL engine (recompute the whitespace-normalized
    * lowercase text from the source table; equality proves no symbol was
    * lost, duplicated, or reordered by the merge machinery).
    */
  def tokenizeDocs(df: DataFrame, idCol: String, textCol: String,
      merges: Vector[(String, String)]): DataFrame =
    applyBpe(df, idCol, textCol, merges, withRoundTrip = true)

  /** Shared apply core: normalization, broadcast ranks, per-task Zipfian
    * memo, and the no-shuffle mapPartitions live HERE ONCE — the two
    * public entry points differ only in whether the round-trip text is
    * materialized (the count path skips the string building entirely).
    */
  private def applyBpe(df: DataFrame, idCol: String, textCol: String,
      merges: Vector[(String, String)], withRoundTrip: Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    // spread off a narrow scan: the greedy per-word merge loop is the
    // kernel (no-op at scale)
    Par.spread(df.select(col(idCol).cast("long").as("id"), col(textCol).as("t")))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val r = bc.value
        val memo = mutable.Map.empty[String, Vector[String]]
        rows.map { case (id, t) =>
          val words = normalizeWords(t)
          var tokens = 0L
          val sb = if (withRoundTrip) new StringBuilder else null
          words.foreach { w =>
            val toks = memo.getOrElseUpdate(w, tokenizeWord(w, r))
            tokens += toks.length
            if (withRoundTrip) {
              if (sb.nonEmpty) sb.append(' ')
              // concat(symbols) == word + Eow by the merge invariant; strip
              // the marker wherever the merges left it fused
              val joined = toks.mkString("")
              sb.append(
                if (joined.endsWith(Eow)) joined.dropRight(Eow.length)
                else joined)
            }
          }
          (id, words.length.toLong, tokens,
            if (withRoundTrip) sb.toString else "")
        }
      }.toDF("id", "n_words", "n_bpe_tokens", "text_rt")
  }
}
