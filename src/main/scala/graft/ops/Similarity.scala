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

  /** Sign-bit LSH bucket id for one table of `numPlanes` hyperplanes. */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int, table: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val planeDot = (0 until dim).map(d =>
        element_at(vec, d + 1).cast("double") * lit(planeCoef(table * 64 + p, d)))
        .reduce(_ + _)
      when(planeDot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN near-duplicate pairs via MULTI-TABLE sign-LSH: `numTables`
    * independent tables of `numPlanes` hyperplanes each; a pair is a
    * candidate if it collides in ANY table (standard LSH amplification —
    * recall = 1-(1-p^m)^L for per-plane agreement p = 1-θ/π). Exact cosine
    * verification within candidates; pairs (id_a < id_b) with cosine ≥
    * threshold. Candidate generation is an equi-join on (table, bucket) so
    * it hash-partitions evenly at scale.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, numPlanes: Int, threshold: Double, numTables: Int = 8): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val buckets = array((0 until numTables).map(t =>
      lshBucket(col("vec"), dim, numPlanes, t)): _*)
    val b = base.select(col("id"), col("vec"), posexplode(buckets))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val pairs = b.as("a").join(b.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.vec").as("va"), col("b.vec").as("vb"))
      .dropDuplicates("id_a", "id_b")
    pairs.withColumn("cos_sim", cosine(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
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
