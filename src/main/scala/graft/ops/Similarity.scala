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
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
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
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
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
    val b = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    b.as("a").join(b.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.vec"), col("b.vec")).as("raw"))
      .filter(col("raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("raw"), 6).as("cos_sim"))
  }
}
