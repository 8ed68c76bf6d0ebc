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

  /** ENGINE-NEUTRAL integer plane matrix: component (p, j) is the first
    * hex nibble of md5("p:j") minus 8, i.e. an int in [-8, 7] — the
    * value any SQL engine computes as
    * `strpos('0123456789abcdef', substr(md5(p || ':' || j), 1, 1)) - 9`.
    * Pure driver-side Scala (java MessageDigest), no Spark job — this
    * also answers the round-3 note that `planeMatrix` spends a job to
    * build a KB-sized matrix. */
  def md5PlaneMatrixInt(planes: Int, dims: Int): Seq[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      (0 until dims).map { j =>
        val h = md.digest(s"$p:$j".getBytes("UTF-8"))
        ((h(0) >> 4) & 0xf) - 8
      }.toArray
    }
  }

  /** Bucket from the md5 integer planes over a QUANTIZED vector
    * (floor(x·1000) per component): every projection is a sum of
    * small-integer products (|term| ≤ 8000, 64 terms ⇒ |sum| < 2²⁰),
    * far inside double exactness — so an engine summing in doubles in
    * ANY order gets the bit-identical projection, and the sign test
    * (and therefore the bucket) is hash-match reproducible cross-engine.
    * The xxhash64 `hyperplaneBucket` stays the production path; this
    * variant exists so the LSH route itself can sit behind the DuckDB
    * oracle gate. */
  def md5QuantBucket(v: Column, planeVecs: Seq[Array[Int]]): Column = {
    val qv = transform(v, x => floor(x.cast("double") * 1000))
    planeVecs.zipWithIndex.map { case (pv, p) =>
      val proj = aggregate(
        zip_with(qv, typedLit(pv.toSeq.map(_.toLong)), (x, c) => x * c),
        lit(0L), (a, t) => a + t)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }
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
    bucketedTopK(qb, cb, k)
  }

  /** `lshTopK` with the engine-neutral md5 integer planes
    * (`Lsh.md5QuantBucket`): same join/score/rank pipeline, but the
    * bucketing is reproducible in plain SQL, putting the whole ANN
    * route — planes, quantized projections, bucket join, cosine top-k —
    * behind the cross-engine hash-match gate. */
  def md5LshTopK(queries: DataFrame, candidates: DataFrame, planes: Int, k: Int): DataFrame = {
    val dims = Lsh.probeDims(candidates, "embedding")
    val pm = Lsh.md5PlaneMatrixInt(planes, dims)
    val qb = queries.withColumn("bucket", Lsh.md5QuantBucket(col("q_vec"), pm))
    val cb = candidates.withColumn("bucket", Lsh.md5QuantBucket(col("embedding"), pm))
    bucketedTopK(qb, cb, k)
  }

  private def bucketedTopK(qb: DataFrame, cb: DataFrame, k: Int): DataFrame = {
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim", VF.cosineSimilarity(col("q_vec"), col("embedding")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("sim"))
  }
}
