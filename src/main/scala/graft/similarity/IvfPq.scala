package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** IVF-PQ: inverted-file pruning composed with product-quantized
  * scoring — the canonical billion-scale ANN layout (FAISS `IVFx,PQy`).
  *
  * IVF contributes the SCAN reduction (probe `nprobe` of `nlist`
  * partitions instead of the corpus) and PQ the MEMORY reduction
  * (m small codes per vector instead of d floats), so the index both
  * prunes and fits at 100 TB: at rest the encoded table partitions by
  * `list_id` (`.write.partitionBy`), a probe reads only the lists it
  * needs (partition pruning), and each candidate costs m table lookups.
  *
  * This composition encodes raw vectors (not per-list residuals — the
  * classic recall refinement trades a per-row gather per subspace for
  * recall; the plumbing is identical, documented simplification).
  */
object IvfPq {

  final case class IvfPqIndex(
      centroids: Seq[(Int, Array[Float])],
      codebooks: Array[Array[Array[Float]]],
      dsub: Int,
      /** input columns + list_id + codes */
      encoded: DataFrame,
      idCol: String,
      vecCol: String)

  /** Coarse-quantize into `nlist` lists (driver-trained k-means,
    * distributed codegen'd assignment — `Ivf.build`) and PQ-encode
    * every vector (`Pq.build`). One pass over the corpus, no shuffle. */
  def build(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      nlist: Int, m: Int, ksub: Int, seed: Long = 42L,
      sampleFraction: Double = 1.0, maxIter: Int = 10,
      trainCap: Int = 16384): IvfPqIndex = {
    val ivf = Ivf.build(vecs, idCol, vecCol, nlist, seed, sampleFraction,
      maxIter, trainCap)
    val pq = Pq.build(ivf.assigned, idCol, vecCol, dim, m, ksub, seed,
      maxIter, trainCap)
    IvfPqIndex(ivf.centroids, pq.codebooks, pq.dsub, pq.encoded,
      idCol, vecCol)
  }

  /** Materialize at rest: the PQ-encoded table partitioned by coarse
    * list — codes are the only payload that has to travel at search
    * time, and a probe's `list_id` choice prunes whole directories
    * (same layout story as `Ivf.writeIndex`, with PQ's ~d·4/m
    * compression on top). The wide raw-vector column is dropped: the
    * index is codes + id, the corpus stays the source of truth. */
  def writeIndex(index: IvfPqIndex, path: String): Unit =
    index.encoded.select(col(index.idCol), col("codes"), col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(path)

  /** Re-open a materialized index (centroids + codebooks are the
    * driver-sized artifacts persisted alongside). */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Seq[(Int, Array[Float])],
      codebooks: Array[Array[Array[Float]]], dsub: Int, idCol: String,
      vecCol: String): IvfPqIndex =
    IvfPqIndex(centroids, codebooks, dsub, spark.read.parquet(path),
      idCol, vecCol)

  /** Top-k per query: rank centroids (broadcast), keep `nprobe` lists,
    * ADC-score only candidates in those lists. Returns
    * (q_id, idCol, adc) — smaller adc = closer (squared L2 to the
    * query, as approximated by the codebooks). */
  def search(index: IvfPqIndex, queries: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.toDF("list_id", "centroid")
    // nearest lists per query by true L2 to the coarse centroids
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cdist").asc, col("list_id"))
    val probePairs = queries.crossJoin(broadcast(cents))
      .withColumn("cdist", GraftExtensions.l2Sq(col("q_vec"), col("centroid")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("list_id"))
    // ADC table computed ONCE per query — it is the build side of a
    // broadcast join onto the (q_id, list_id) probe pairs, so the
    // m×ksub array is evaluated per query row, not per probed list
    val dt = broadcast(queries.select(col("q_id"),
      Pq.dtableExpr(index.codebooks, index.dsub, col("q_vec")).as("__dt")))
    val probes = probePairs.join(dt, Seq("q_id"))
    val scored = index.encoded
      .select(col(index.idCol), col("list_id"), col("codes"))
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col(index.idCol))
      .withColumn("adc", Pq.adcExpr(col("codes"), col("__dt"), index.codebooks.length))
    Pq.topK(scored, index.idCol, k)
  }
}
