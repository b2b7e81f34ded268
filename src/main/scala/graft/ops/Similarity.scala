package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, per the pipeline brief:
  *  - brute-force cosine top-k: the exact baseline, a broadcast-joined
  *    cross product — correct at any k, O(N·Q) so only for bounded query
  *    sets (or as the per-bucket kernel below);
  *  - LSH-bucketed ANN (random hyperplanes → sign bits → bucket equi-join):
  *    the scale path — candidate generation is an equi-join on a small
  *    bucket id, so it hash-partitions evenly and never materializes the
  *    quadratic pair space.
  *
  * All math is `aggregate`/`zip_with` over doubles (codegen'd, no UDF).
  */
object Similarity {

  /** dot(a, b) as a Column over two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k neighbors for each query row.
    * `queries` and `corpus` both need (idCol, vecCol). Query side is
    * broadcast (bounded query sets by contract). Self-matches excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    // spread the stream side: the |corpus|×|queries| cosine evaluations
    // run in the scan stage of the broadcast join — a narrow scan would
    // serialize them (no-op at scale)
    val c = Par.spread(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d coefficient
    * derived from a hash — reproducible across runs and engines with no
    * stored model.
    */
  private def planeCoef(p: Int, d: Int): Double = {
    val h = graft.core.XxHash64.hashLong((p.toLong << 32) | d.toLong, 1234L)
    (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  /** Plane count for a corpus of `n` vectors: enough sign bits that the
    * expected bucket occupancy is ~`targetBucket`, so the within-bucket pair
    * join stays linear-ish as the corpus grows (2^planes buckets per table).
    * 10^9 vectors → ~25 planes; the 2k-vector test corpus → 8.
    */
  def planesFor(n: Long, targetBucket: Int = 8, min: Int = 4, max: Int = 30): Int = {
    val want = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(max, math.max(min, want))
  }

  /** Per-row (id, tbl, bucket) LSH bucket rows via a broadcast plane-matrix
    * kernel inside mapPartitions: ONE fused dot-product loop per (row,
    * table) against driver-built hyperplanes — not a per-dim Catalyst
    * expression tree (the naive expression form compiles 2k+ nodes per row
    * and ships multi-MiB task binaries). Plane coefficients stay the
    * deterministic planeCoef hash family, so buckets are reproducible with
    * no stored model.
    */
  def lshBucketRows(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, numPlanes: Int, numTables: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // spread off a narrow scan: the fused plane-matrix kernel runs per row
    // and BOTH sides of the candidate self-join evaluate this subtree
    // (per-row bucket math is partitioning-independent; no-op at scale)
    val base = Par.spread(
      df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec")))
    // plane-index layout keeps table stride 64 so buckets match the previous
    // Column formulation for any numPlanes <= 64
    val planes: Array[Array[Double]] = Array.tabulate(numTables * numPlanes) { pi =>
      val t = pi / numPlanes; val p = pi % numPlanes
      Array.tabulate(dim)(d => planeCoef(t * 64 + p, d))
    }
    val bc = spark.sparkContext.broadcast(planes)
    val nt = numTables; val np = numPlanes
    base.as[(Long, Seq[Float])].mapPartitions { it =>
      val pl = bc.value
      it.flatMap { case (id, vec) =>
        val arr = new Array[Double](vec.length)
        var j = 0
        while (j < arr.length) { arr(j) = vec(j).toDouble; j += 1 }
        (0 until nt).iterator.map { t =>
          var bucket = 0L
          var p = 0
          while (p < np) {
            val plane = pl(t * np + p)
            var dp = 0.0
            var k = 0
            val n = math.min(arr.length, plane.length)
            while (k < n) { dp += arr(k) * plane(k); k += 1 }
            if (dp > 0) bucket |= (1L << p)
            p += 1
          }
          (id, t, bucket)
        }
      }
    }.toDF("id", "tbl", "bucket")
  }

  /** ANN near-duplicate pairs via MULTI-TABLE sign-LSH: `numTables`
    * independent tables of `numPlanes` hyperplanes each; a pair is a
    * candidate if it collides in ANY table (standard LSH amplification —
    * recall = 1-(1-p^m)^L for per-plane agreement p = 1-θ/π). Exact cosine
    * verification within candidates; pairs (id_a < id_b) with cosine ≥
    * threshold. Candidate generation is an equi-join on (table, bucket) so
    * it hash-partitions evenly at scale; only (id_a, id_b) travels through
    * the dedup shuffle — vectors re-join by id for verification.
    *
    * `dim <= 0` derives the dimension from the first row; `numPlanes <= 0`
    * scales the plane count with the corpus size (planesFor).
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int = -1, numPlanes: Int = -1, threshold: Double = 0.8,
      numTables: Int = 8): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    // deliberately TWO cheap jobs, not one fused agg: head() is a
    // limit-1 probe and count() is satisfied from parquet metadata,
    // while a fused max(size)+count aggregate would full-scan the corpus
    // at scale just to derive two parameters (measured equal locally)
    val d = if (dim > 0) dim else base.select(size(col("vec"))).head().getInt(0)
    val np = if (numPlanes > 0) numPlanes else planesFor(base.count())
    val b = lshBucketRows(df, idCol, vecCol, d, np, numTables)
    val candidates = b.as("a").join(b.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(base.select(col("id").as("id_a"), col("vec").as("va")), "id_a")
      .join(base.select(col("id").as("id_b"), col("vec").as("vb")), "id_b")
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  // --- IVF (inverted-file) ANN: the k-means-cell scale path ---------------

  /** Nearest-centroid index for one vector (plain dot-product argmin over
    * a small broadcast centroid matrix). Exposed as `nearestCellPublic`
    * for test oracles.
    */
  def nearestCellPublic(vec: Array[Double], centroids: Array[Array[Double]]): Int =
    nearestCell(vec, centroids)

  private def nearestCell(vec: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var j = 0
      val n = math.min(vec.length, cent.length)
      while (j < n) { val t = vec(j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Per-partition k-means partials: each task folds ALL its vectors into
    * at most `centroids.length` (cell, sum-vector, count) rows — the
    * classic k-means combiner. Only these partials ever shuffle, so the
    * per-iteration shuffle volume is O(partitions · nlist · dim) rows, not
    * O(N · dim) vectors over the wire (asserted by `OpsSpec`).
    */
  def ivfPartials(base: org.apache.spark.sql.Dataset[(Long, Seq[Float])],
      centroids: Array[Array[Double]]): org.apache.spark.sql.Dataset[(Int, Array[Double], Long)] = {
    val spark = base.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    base.mapPartitions { rows =>
      val cents = bc.value
      val sums = new Array[Array[Double]](cents.length)
      val counts = new Array[Long](cents.length)
      rows.foreach { case (_, vec) =>
        val arr = new Array[Double](vec.length)
        var j = 0
        while (j < arr.length) { arr(j) = vec(j).toDouble; j += 1 }
        val c = nearestCell(arr, cents)
        if (sums(c) == null) sums(c) = new Array[Double](arr.length)
        val s = sums(c)
        var k = 0
        val n = math.min(s.length, arr.length)
        while (k < n) { s(k) += arr(k); k += 1 }
        counts(c) += 1
      }
      cents.indices.iterator.filter(counts(_) > 0)
        .map(c => (c, sums(c), counts(c)))
    }
  }

  /** Train an IVF coarse quantizer with a few Lloyd iterations:
    * deterministic init (the `nlist` corpus vectors with the smallest
    * xxhash64(id) — reproducible, no RNG), then assign + per-cell mean.
    * Centroids are tiny (nlist × dim doubles) — they live on the driver
    * and broadcast; assignment + summation happen INSIDE mapPartitions
    * (ivfPartials), so each iteration shuffles only the
    * partitions × nlist pre-aggregated partials, never the corpus.
    */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iterations: Int = 3): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Seq[Float])]
    var centroids: Array[Array[Double]] = base.toDF()
      .withColumn("h", xxhash64(col("id"))).orderBy(col("h"))
      .limit(nlist).select(col("vec")).as[Seq[Float]]
      .collect().map(_.toArray.map(_.toDouble))
    var it = 0
    while (it < iterations) {
      val sums = ivfPartials(base, centroids)
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val s = a._2.clone()
          var j = 0
          val n = math.min(s.length, b._2.length)
          while (j < n) { s(j) += b._2(j); j += 1 }
          (a._1, s, a._3 + b._3)
        }
        .map { case (cell, (_, sum, count)) =>
          val m = sum.clone()
          var j = 0
          while (j < m.length) { m(j) /= count; j += 1 }
          (cell, m)
        }.collect()
      // empty cells keep their previous centroid
      val next = centroids.map(_.clone())
      sums.foreach { case (cell, mean) => next(cell) = mean }
      centroids = next
      it += 1
    }
    centroids
  }

  /** IVF ANN top-k: corpus vectors are bucketed by nearest centroid cell;
    * each query probes its `nprobe` nearest cells and exact-reranks only
    * those cells' vectors. Candidate generation is an equi-join on the
    * cell id — never a cross join with the corpus — so it hash-partitions
    * evenly; recall is the standard nprobe/nlist trade.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iterations: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = ivfTrain(corpus, idCol, vecCol, nlist, iterations)
    val bc = spark.sparkContext.broadcast(centroids)
    val corpusCells = corpus
      .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("nvec"))
      .as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val cents = bc.value
        rows.map { case (id, vec) =>
          (nearestCell(vec.toArray.map(_.toDouble), cents), id, vec)
        }
      }.toDF("cell", "neighbor_id", "nvec")
    val np = math.min(nprobe, nlist)
    val queryCells = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
      .as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val cents = bc.value
        rows.flatMap { case (id, vec) =>
          val arr = vec.toArray.map(_.toDouble)
          val byDist = cents.indices.sortBy { c =>
            var d = 0.0; var j = 0
            val n = math.min(arr.length, cents(c).length)
            while (j < n) { val t = arr(j) - cents(c)(j); d += t * t; j += 1 }
            d
          }
          byDist.take(np).map(cell => (cell, id, vec))
        }
      }.toDF("cell", "query_id", "qvec")
    val scored = corpusCells.join(queryCells, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"), col("rank"))
  }

  /** Exact cosine near-duplicate pairs over a bounded corpus (the oracle
    * baseline for the LSH variant): full pair join, id_a < id_b.
    */
  def exactNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // spread: the O(n²) pairwise cosines evaluate in the stream-side scan
    // stage of the nested-loop join — parallelize it off a narrow scan
    // (bounded corpus by contract, so the quadratic itself is documented)
    val b = Par.spread(df.select(col(idCol).as("id"), col(vecCol).as("vec")))
    b.as("a").join(b.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.vec"), col("b.vec")).as("raw"))
      .filter(col("raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("raw"), 6).as("cos_sim"))
  }

  // ---- product quantization (Jégou/Douze/Schmid, TPAMI 2011 — public):
  // m-subvector byte codes + asymmetric-distance (ADC) scan ---------------

  /** Nearest codebook entry for one subvector (L2). */
  private def nearestSub(vec: Array[Double], off: Int, dsub: Int,
      book: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val cent = book(c)
      var d = 0.0
      var j = 0
      while (j < dsub) { val t = vec(off + j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Per-partition PQ-k-means partials for ALL m subspaces at once: each
    * task folds its vectors into at most m·ksub ((subspace, cell),
    * sum-subvector, count) rows — the fused combiner, so one Lloyd
    * iteration over every codebook shuffles O(partitions · m · ksub ·
    * dsub), never the corpus (the same shape as `ivfPartials`, asserted
    * by OpsSpec).
    */
  def pqPartials(base: org.apache.spark.sql.Dataset[(Long, Seq[Float])],
      codebooks: Array[Array[Array[Double]]]):
      org.apache.spark.sql.Dataset[(Int, Int, Array[Double], Long)] = {
    val spark = base.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(codebooks)
    base.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val books = bc.value
      val m = books.length
      val ksub = books(0).length
      val dsub = books(0)(0).length
      val sums = new Array[Array[Double]](m * ksub)
      val counts = new Array[Long](m * ksub)
      rows.foreach { case (_, vec) =>
        val arr = new Array[Double](vec.length)
        var j = 0
        while (j < arr.length) { arr(j) = vec(j).toDouble; j += 1 }
        var sub = 0
        while (sub < m) {
          val c = nearestSub(arr, sub * dsub, dsub, books(sub))
          val key = sub * ksub + c
          if (sums(key) == null) sums(key) = new Array[Double](dsub)
          val s = sums(key)
          var d = 0
          while (d < dsub) { s(d) += arr(sub * dsub + d); d += 1 }
          counts(key) += 1
          sub += 1
        }
      }
      (0 until m * ksub).iterator.filter(counts(_) > 0)
        .map(key => (key, pid, sums(key), counts(key)))
    }
  }

  /** Train PQ codebooks: split the space into `m` contiguous subspaces of
    * dim/m dims and k-means each one to `ksub` entries. Deterministic
    * init (smallest-xxhash64(id) rows, like ivfTrain); every iteration is
    * ONE fused pass over the corpus (pqPartials). Codebooks are tiny
    * (m · ksub · dsub doubles) — driver + broadcast.
    * Returns codebooks(subspace)(entry)(dsub).
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int = 16, iterations: Int = 3): Array[Array[Array[Double]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Seq[Float])]
    // id as the secondary sort key makes the seed picks a total order even
    // under (improbable) xxhash64 collisions — run-to-run determinism
    val seed = base.toDF()
      .withColumn("h", xxhash64(col("id"))).orderBy(col("h"), col("id"))
      .limit(ksub).select(col("vec")).as[Seq[Float]]
      .collect().map(_.toArray.map(_.toDouble))
    require(seed.nonEmpty, "empty corpus")
    val dim = seed(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    var books: Array[Array[Array[Double]]] = Array.tabulate(m) { sub =>
      Array.tabulate(math.min(ksub, seed.length)) { c =>
        java.util.Arrays.copyOfRange(seed(c), sub * dsub, (sub + 1) * dsub)
      }
    }
    var it = 0
    while (it < iterations) {
      // fold the per-partition partials in PARTITION-ID order: float sums
      // are order-sensitive, and reduceGroups' shuffle-arrival order would
      // make the trained codebooks vary run to run
      val means = pqPartials(base, books)
        .groupByKey(_._1)
        .mapGroups { (key, it) =>
          val parts = it.toArray.sortBy(_._2)
          val sum = new Array[Double](parts(0)._3.length)
          var count = 0L
          parts.foreach { case (_, _, s, c) =>
            var j = 0
            while (j < sum.length) { sum(j) += s(j); j += 1 }
            count += c
          }
          var j = 0
          while (j < sum.length) { sum(j) /= count; j += 1 }
          (key, sum)
        }.collect()
      val next = books.map(_.map(_.clone()))
      val kk = books(0).length
      means.foreach { case (key, mean) => next(key / kk)(key % kk) = mean }
      books = next // empty cells keep their previous entry
      it += 1
    }
    books
  }

  /** Encode each vector to an m-byte PQ code plus its TRUE norm (kept so
    * the ADC scan can rank by cosine, not just inner product). ~dim·4/m ×
    * compression of the scan set: at 100 TB of float32 embeddings the
    * code table is the only thing the top-k scan reads.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(codebooks)
    corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val books = bc.value
        val m = books.length
        val dsub = books(0)(0).length
        rows.map { case (id, vec) =>
          val arr = new Array[Double](vec.length)
          var j = 0
          while (j < arr.length) { arr(j) = vec(j).toDouble; j += 1 }
          val code = new Array[Byte](m)
          var nrm = 0.0
          var sub = 0
          while (sub < m) {
            code(sub) = nearestSub(arr, sub * dsub, dsub, books(sub)).toByte
            sub += 1
          }
          j = 0
          while (j < arr.length) { nrm += arr(j) * arr(j); j += 1 }
          (id, code, math.sqrt(nrm))
        }
      }.toDF("id", "code", "norm")
  }

  /** PQ ANN top-k with ADC: per query, a m×ksub inner-product lookup
    * table against the codebooks turns each corpus distance into m table
    * lookups over the byte code (no per-dim float math in the scan);
    * approximate cosine = ADC-dot / (‖q‖ · true ‖x‖). Each partition
    * keeps only its top-`rerank` candidates per query (bounded heaps), so
    * the shuffle is O(partitions · queries · rerank); the survivors
    * exact-rerank against their true vectors. Queries are a bounded set
    * (broadcast), like the other top-k entry points.
    *
    * Measured recall@10 vs brute force on the synthetic dim-64 corpus
    * (uniform random — PQ's WORST case, no cluster structure): 0.29 /
    * 0.52 / 0.72 / 0.87 at rerank 10/32/64/128 with m=8, ksub=16; real
    * embedding distributions quantize far better. The rerank knob is the
    * standard recall/throughput trade.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, ksub: Int = 16, iterations: Int = 3,
      rerank: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = pqTrain(corpus, idCol, vecCol, m, ksub, iterations)
    val codes = pqEncode(corpus, idCol, vecCol, books)
      .as[(Long, Array[Byte], Double)]
    // driver-side LUTs: queries are bounded by contract
    val qRows = queries
      .select(col(idCol).cast("long").as("qid"), col(vecCol).as("qvec"))
      .as[(Long, Seq[Float])].collect()
    val kk = books(0).length
    val dsub = books(0)(0).length
    val luts: Array[(Long, Array[Double], Double)] = qRows.map { case (qid, qv) =>
      val q = qv.toArray.map(_.toDouble)
      val lut = new Array[Double](m * kk)
      var sub = 0
      while (sub < m) {
        var c = 0
        while (c < kk) {
          var s = 0.0
          var d = 0
          while (d < dsub) { s += q(sub * dsub + d) * books(sub)(c)(d); d += 1 }
          lut(sub * kk + c) = s
          c += 1
        }
        sub += 1
      }
      (qid, lut, math.sqrt(q.map(x => x * x).sum))
    }
    val lutBc = spark.sparkContext.broadcast(luts)
    val r = math.max(k, rerank)
    // partition-local top-r per query over the byte codes
    val cand = codes.mapPartitions { rows =>
      val qs = lutBc.value
      val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
        Ordering.by[(Double, Long), Double](-_._1))) // min-heap on score
      rows.foreach { case (id, code, nrm) =>
        var qi = 0
        while (qi < qs.length) {
          val (qid, lut, qn) = qs(qi)
          if (qid != id) {
            var adc = 0.0
            var sub = 0
            while (sub < code.length) {
              adc += lut(sub * kk + (code(sub) & 0xff))
              sub += 1
            }
            val score = adc / math.max(qn * nrm, 1e-12)
            val h = heaps(qi)
            if (h.size < r) h.enqueue((score, id))
            else if (score > h.head._1) { h.dequeue(); h.enqueue((score, id)) }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (score, id) => (qs(qi)._1, id, score) }
      }
    }.toDF("query_id", "neighbor_id", "adc_cos")
    // global top-r of the partition-local winners, then EXACT rerank
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("neighbor_id").asc)
    val topCand = cand.withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= r).drop("arank", "adc_cos")
    val truth = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("nvec"))
    val qDf = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qvec"))
    val exact = topCand.join(truth, "neighbor_id").join(broadcast(qDf), "query_id")
      .withColumn("cos_sim", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"), col("rank"))
  }

  /** IVF+PQ composition — the FAISS IVFPQ shape, what a 100-TB vector
    * corpus actually runs (Jégou et al. 2011 §IV):
    *
    *  1. coarse quantizer: k-means cells (`ivfTrain`), each corpus vector
    *     assigned to its nearest cell;
    *  2. ONE product quantizer trained on the RESIDUALS (vector − cell
    *     centroid) — residuals concentrate near 0 so the same codebook
    *     budget quantizes much finer than raw-vector PQ;
    *  3. scan: each query probes its `nprobe` nearest cells; only codes in
    *     probed cells reach the ADC loop (the `isin` filter also pushes
    *     down to storage when the code table is persisted bucketed by
    *     cell), scored as (dot(q, centroid) + Σ lut[code]) / (‖q‖·‖x‖)
    *     with the TRUE vector norm carried per code — cosine ranking from
    *     m byte lookups;
    *  4. partition-local bounded heaps (shuffle O(partitions · Q ·
    *     rerank)) then exact rerank via join, like `pqTopK`.
    *
    * vs `pqTopK`: the scan does nprobe/nlist of the ADC work per query.
    * vs `ivfTopK`: probed cells are scanned as m-byte codes, not floats.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
      iterations: Int = 3, rerank: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = ivfTrain(corpus, idCol, vecCol, nlist, iterations)
    val centBc = spark.sparkContext.broadcast(centroids)
    val base = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Seq[Float])]
    // PQ on residuals: one codebook set across all cells (FAISS IVFPQ)
    val residuals = base.mapPartitions { rows =>
      val cents = centBc.value
      rows.map { case (id, vec) =>
        val arr = vec.toArray.map(_.toDouble)
        val cell = nearestCell(arr, cents)
        val res = new Array[Float](arr.length)
        var j = 0
        while (j < arr.length) { res(j) = (arr(j) - cents(cell)(j)).toFloat; j += 1 }
        (id, res.toSeq)
      }
    }.toDF("id", "vec")
    val books = pqTrain(residuals, "id", "vec", m, ksub, iterations)
    val bookBc = spark.sparkContext.broadcast(books)
    val kk = books(0).length
    val dsub = books(0)(0).length
    // inverted-list code table: (cell, id, m-byte residual code, true norm)
    val codes = base.mapPartitions { rows =>
      val cents = centBc.value
      val bks = bookBc.value
      val ds = bks(0)(0).length
      rows.map { case (id, vec) =>
        val arr = new Array[Double](vec.length)
        var j = 0
        var nrm = 0.0
        while (j < arr.length) {
          arr(j) = vec(j).toDouble; nrm += arr(j) * arr(j); j += 1
        }
        val cell = nearestCell(arr, cents)
        val res = new Array[Double](arr.length)
        j = 0
        while (j < arr.length) { res(j) = arr(j) - cents(cell)(j); j += 1 }
        val code = new Array[Byte](bks.length)
        var sub = 0
        while (sub < bks.length) {
          code(sub) = nearestSub(res, sub * ds, ds, bks(sub)).toByte
          sub += 1
        }
        (cell, id, code, math.sqrt(nrm))
      }
    }.toDF("cell", "id", "code", "norm")
    // driver-side query prep (bounded query sets by contract): residual
    // LUT + probed cells with their dot(q, centroid) offsets
    val np = math.min(nprobe, nlist)
    val qRows = queries
      .select(col(idCol).cast("long").as("qid"), col(vecCol).as("qvec"))
      .as[(Long, Seq[Float])].collect()
    val qInfos: Array[(Long, Array[Double], Double, Array[(Int, Double)])] =
      qRows.map { case (qid, qv) =>
        val q = qv.toArray.map(_.toDouble)
        val lut = new Array[Double](m * kk)
        var sub = 0
        while (sub < m) {
          var c = 0
          while (c < kk) {
            var s = 0.0
            var d = 0
            while (d < dsub) { s += q(sub * dsub + d) * books(sub)(c)(d); d += 1 }
            lut(sub * kk + c) = s
            c += 1
          }
          sub += 1
        }
        val probed = centroids.indices.sortBy { ci =>
          var dd = 0.0
          var j = 0
          val n = math.min(q.length, centroids(ci).length)
          while (j < n) { val t = q(j) - centroids(ci)(j); dd += t * t; j += 1 }
          dd
        }.take(np).map { ci =>
          var s = 0.0
          var j = 0
          val n = math.min(q.length, centroids(ci).length)
          while (j < n) { s += q(j) * centroids(ci)(j); j += 1 }
          (ci, s)
        }.toArray
        (qid, lut, math.sqrt(q.map(x => x * x).sum), probed)
      }
    val qBc = spark.sparkContext.broadcast(qInfos)
    val probedCells = qInfos.flatMap(_._4.map(_._1)).distinct.toSeq
    val r = math.max(k, rerank)
    val cand = codes
      .filter(col("cell").isin(probedCells: _*)) // cell pruning
      .as[(Int, Long, Array[Byte], Double)]
      .mapPartitions { rows =>
        val qs = qBc.value
        // cell → (query index, dot(q, centroid)) — only probing queries
        // pay ADC for a code row
        val byCell = scala.collection.mutable.Map
          .empty[Int, List[(Int, Double)]].withDefaultValue(Nil)
        qs.zipWithIndex.foreach { case ((_, _, _, probed), qi) =>
          probed.foreach { case (cell, cd) => byCell(cell) = (qi, cd) :: byCell(cell) }
        }
        val heaps = qs.map(_ =>
          new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
            Ordering.by[(Double, Long), Double](-_._1)))
        rows.foreach { case (cell, id, code, nrm) =>
          byCell(cell).foreach { case (qi, cellDot) =>
            val (qid, lut, qn, _) = qs(qi)
            if (qid != id) {
              var adc = cellDot
              var sub = 0
              while (sub < code.length) {
                adc += lut(sub * kk + (code(sub) & 0xff))
                sub += 1
              }
              val score = adc / math.max(qn * nrm, 1e-12)
              val h = heaps(qi)
              if (h.size < r) h.enqueue((score, id))
              else if (score > h.head._1) { h.dequeue(); h.enqueue((score, id)) }
            }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (score, id) => (qs(qi)._1, id, score) }
        }
      }.toDF("query_id", "neighbor_id", "adc_cos")
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("neighbor_id").asc)
    val topCand = cand.withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= r).drop("arank", "adc_cos")
    val truth = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("nvec"))
    val qDf = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qvec"))
    val exact = topCand.join(truth, "neighbor_id").join(broadcast(qDf), "query_id")
      .withColumn("cos_sim", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"), col("rank"))
  }
}
