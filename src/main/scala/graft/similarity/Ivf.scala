package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.expressions.GraftExtensions

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * coarse-quantizer scale path next to hyperplane LSH (`Knn.lshTopK`).
  *
  * Build: k-means over (a sample of) the corpus learns `nlist`
  * centroids; every vector is assigned to its nearest centroid — one
  * narrow shuffle, and at rest the assignment is a partition column
  * (`.write.partitionBy("list_id")`), so a probe reads only the lists
  * it needs. Search: each query scores the centroid table (tiny,
  * broadcast), keeps its `nprobe` nearest lists, and scans only those
  * lists — the candidate set shrinks by ~nlist/nprobe versus a full
  * scan, which is the whole game at 100 TB.
  */
object Ivf {

  /** Assignment of every vector to its nearest centroid list. The id
    * and vector column NAMES ride along so `search` binds by name,
    * not position, regardless of the input column order. */
  final case class IvfIndex(
      centroids: Seq[(Int, Array[Float])],
      assigned: DataFrame, // input columns + list_id
      idCol: String,
      vecCol: String)

  /** K-means the corpus into `nlist` lists. `sampleFraction` < 1 fits
    * the model on a sample (the standard trick when the corpus is
    * huge) while still assigning every vector. */
  def build(vecs: DataFrame, idCol: String, vecCol: String, nlist: Int,
      seed: Long = 42L, sampleFraction: Double = 1.0,
      maxIter: Int = 20): IvfIndex = {
    val withFeatures = vecs.withColumn("__f",
      array_to_vector(col(vecCol).cast("array<float>")))
    val trainSet =
      if (sampleFraction >= 1.0) withFeatures
      else withFeatures.sample(withReplacement = false, sampleFraction, seed)
    trainSet.persist()
    val model = try new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__f").setPredictionCol("list_id")
      .fit(trainSet)
    finally trainSet.unpersist(false)
    val assigned = model.transform(withFeatures).drop("__f")
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      i -> c.toArray.map(_.toFloat)
    }.toSeq
    require(assigned.columns.contains(idCol) && assigned.columns.contains(vecCol),
      s"id/vector columns $idCol/$vecCol must exist in the input")
    IvfIndex(centroids, assigned, idCol, vecCol)
  }

  /** Top-k cosine neighbors per query, scanning only the `nprobe`
    * nearest lists. queries: (q_id, q_vec). */
  def search(index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.toDF("list_id", "centroid")
    // per-query centroid ranking — queries × nlist rows, centroid side broadcast
    val probeW = Window.partitionBy("q_id")
      .orderBy(col("cdist").asc, col("list_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("cdist",
        -GraftExtensions.dot(col("q_vec"), col("centroid")) /
          sqrt(GraftExtensions.dot(col("centroid"), col("centroid"))))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("list_id"))
    // scan only the probed lists
    val idCol = index.idCol
    val vecCol = index.vecCol
    val scored = index.assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col(idCol))
      .withColumn("sim",
        graft.functions.VectorFunctions.cosineSimilarity(col("q_vec"), col(vecCol)))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(idCol), col("sim"))
  }
}
