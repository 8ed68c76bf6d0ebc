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

  /** The same plane components as `projection`, materialized driver-side
    * into a planes×dims matrix — computed with the IDENTICAL xxhash64
    * expression, so buckets are bit-for-bit the same. At cluster scale
    * this matrix is what you'd broadcast. */
  def planeMatrix(spark: org.apache.spark.sql.SparkSession,
      planes: Int, dims: Int): Seq[Array[Double]] = {
    val rows = spark.range(dims).select(
      (0 until planes).map(p => planeComponent(p, col("id").cast("int")).as(s"p$p")): _*)
      .collect()
    (0 until planes).map(p => rows.map(_.getDouble(p)))
  }

  /** Codegen fast path of `hyperplaneBucket`: the interpreted
    * zip_with/aggregate projection becomes a native dot product against
    * literal plane vectors (graft.expressions.DotProduct) — identical
    * fold order, identical buckets, whole-stage codegen. */
  def hyperplaneBucketFast(v: Column, planeVecs: Seq[Array[Double]]): Column =
    planeVecs.zipWithIndex.map { case (pv, p) =>
      when(graft.expressions.GraftExtensions.dot(v, typedLit(pv)) >= 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Probe the (uniform) dimensionality of a vector column — one
    * CollectLimit job, the same short-circuit as F24 dims resolution. */
  def probeDims(df: DataFrame, vecCol: String): Int =
    df.where(col(vecCol).isNotNull).select(size(col(vecCol)))
      .limit(1).collect().headOption.map(_.getInt(0)).getOrElse(0)
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
    val dims = Lsh.probeDims(candidates, "embedding")
    val pm = Lsh.planeMatrix(candidates.sparkSession, planes, dims)
    val qb = queries.withColumn("bucket", Lsh.hyperplaneBucketFast(col("q_vec"), pm))
    val cb = candidates.withColumn("bucket", Lsh.hyperplaneBucketFast(col("embedding"), pm))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim", VF.cosineSimilarity(col("q_vec"), col("embedding")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("sim"))
  }
}
