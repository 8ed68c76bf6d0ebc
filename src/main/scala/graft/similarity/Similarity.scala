package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{VectorFunctions => VF}

/** Deterministic pseudo-random hyperplane LSH for embedding vectors.
  *
  * Plane components are derived from xxhash64(plane, dim) mapped to
  * [-1, 1] — no RNG state, so buckets are identical across runs,
  * executors, and engines that reimplement the formula.
  */
object Lsh {

  /** Component j of plane p: xxhash64 of the pair, scaled to [-1, 1]. */
  private def planeComponent(p: Int, j: Column): Column =
    (xxhash64(lit(p), j).cast("double") / lit(Long.MaxValue.toDouble))

  /** Signed projection of v onto pseudo-random plane p. */
  def projection(v: Column, p: Int): Column =
    aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, j) => x.cast("double") * planeComponent(p, j)),
      lit(0.0), (acc, t) => acc + t)

  /** Bucket id: the `planes`-bit sign pattern of the projections. */
  def hyperplaneBucket(v: Column, planes: Int): Column =
    (0 until planes).map { p =>
      when(projection(v, p) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
}

/** Approximate/exact nearest-neighbor search over an embedding column. */
object Knn {

  /** Brute-force cosine top-k: every query scored against every
    * candidate. The query side is broadcast (it is small by
    * construction); the candidate scan stays partition-parallel, so
    * this scales to arbitrarily large candidate sets — the O(Q·N)
    * cost is the point of comparison for the LSH variant. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // queries: (q_id, q_vec); candidates: (vec_id, embedding)
    val scored = candidates.join(broadcast(queries),
        col("q_id") =!= col("vec_id"))
      .withColumn("sim", VF.cosineSimilarity(col("q_vec"), col("embedding")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("sim"))
  }

  /** LSH-bucketed ANN top-k: candidates are only scored when they share
    * a hyperplane bucket with the query — the 100 TB path: bucket is a
    * join key, so the work is one shuffle on a small key instead of a
    * full cross product. Recall is traded via `planes`. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, planes: Int, k: Int): DataFrame = {
    val qb = queries.withColumn("bucket", Lsh.hyperplaneBucket(col("q_vec"), planes))
    val cb = candidates.withColumn("bucket", Lsh.hyperplaneBucket(col("embedding"), planes))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim", VF.cosineSimilarity(col("q_vec"), col("embedding")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("sim"))
  }
}
