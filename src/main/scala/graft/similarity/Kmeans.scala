package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorAggregates

/** Distributed Lloyd's k-means over the FULL corpus — the companion to
  * `Ivf.build`'s driver-side quantizer training and the engine's
  * embedding-clustering primitive (cluster-balanced curation sampling,
  * SemDeDup-style bucket pruning, IVF coarse training past the sample).
  *
  * `Ivf.build` trains on a `trainCap`-bounded hash-ordered sample — the
  * right call for a coarse ANN quantizer, where FAISS-style practice
  * needs only a sketch of the distribution and the sample keeps
  * training off the cluster entirely. This object is the other regime:
  * when the centroids themselves are the product (data-curation cluster
  * assignments, per-cluster quotas, drift baselines), train on EVERY
  * row. Each Lloyd iteration is
  *
  *   assign:  per-row codegen'd argmax of `v·c − ‖c‖²/2` over the k
  *            broadcast centroids (`Ivf.assignTo` — the identical
  *            expression the IVF index uses, so clusters and IVF lists
  *            can never disagree on tie-breaks), map-only;
  *   update:  `VectorAggregates.elementwiseStats` keyed by cluster —
  *            ONE exchange whose payload is k rows per map partition
  *            (a fixed-width sum/count buffer each), never the vectors.
  *
  * At 100 TB that is one corpus scan plus a k×partitions-row shuffle
  * per iteration and a k-row driver collect — no all-pairs stage, no
  * per-row driver work, nothing that grows beyond O(k·dim) on the
  * driver. Callers should persist the projected input across
  * iterations (`lloyd` does so internally) exactly as they would for
  * any iterative algorithm.
  *
  * Init is the engine-neutral md5-rank seed pick (`Ivf.buildMd5Seeded`'s
  * trick): the k corpus vectors ranking first by `md5(CAST(id AS
  * STRING))` — a seeded unbiased sample ANY SQL engine reproduces, so
  * the first full iteration (assign + mean update) is hash-match gated
  * against the DuckDB oracle in `q_kmeans_iter_oracle`. (k-means++ is
  * inherently a sequential driver loop; at full-corpus scale the
  * random-sample init + more Lloyd rounds is the standard trade.)
  *
  * Reference scope: vector-io ships no clustering, but its VDF corpus
  * is exactly what a curation pipeline clusters; this is part of the
  * beyond-parity training-data layer (SURVEY §7.5).
  */
object Kmeans {

  /** Trained model: centroids (list_id → vector), iterations actually
    * run, and the last iteration's max centroid shift (L2). */
  final case class KmeansModel(
      centroids: Seq[(Int, Array[Float])],
      iters: Int,
      lastShift: Double)

  /** The md5-ranked deterministic seed centroids (delegates to
    * `Ivf.buildMd5Seeded`, which shares the assignment expression). */
  def md5Seeds(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Int, Array[Float])] =
    Ivf.buildMd5Seeded(vecs, idCol, vecCol, nlist = k).centroids

  /** One Lloyd update in exact sum/count form, UNCOLLECTED: rows
    * (list_id, sum: array<double>, n) — one narrow exchange. Exposed so
    * the oracle query (`q_kmeans_iter_oracle`) runs the literal
    * production dataflow and only formats the output; empty clusters
    * simply have no row (both engines agree by construction). */
  def updateStats(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])]): DataFrame =
    Ivf.assignTo(
        vecs.select(col(idCol), col(vecCol).cast("array<float>").as(vecCol))
          .filter(col(vecCol).isNotNull),
        centroids, idCol, vecCol)
      .groupBy("list_id")
      .agg(VectorAggregates.elementwiseStats(col(vecCol)).as("st"))
      .select(col("list_id"), col("st.sum").as("sum"), col("st.n").as("n"))

  /** One full distributed Lloyd iteration: new centroids (means), with
    * empty clusters keeping their previous centroid (the same choice as
    * `Ivf.lloyd`'s driver loop). */
  def step(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])]): Seq[(Int, Array[Float])] = {
    val updated: Map[Int, Array[Float]] =
      updateStats(vecs, idCol, vecCol, centroids).collect().map {
        case Row(listId: Int, sum: scala.collection.Seq[_], n: Long) =>
          val s = sum.asInstanceOf[scala.collection.Seq[Double]]
          val c = new Array[Float](s.length)
          var i = 0
          while (i < s.length) { c(i) = (s(i) / n).toFloat; i += 1 }
          listId -> c
      }.toMap
    centroids.map { case (i, prev) => i -> updated.getOrElse(i, prev) }
  }

  /** Full-corpus Lloyd: md5-seed init, iterate `step` until the max
    * centroid shift (L2 distance old→new) drops to `tol` or `maxIter`
    * rounds. The projected input is persisted for the duration (each
    * iteration re-reads it; at cluster scale that is the difference
    * between maxIter corpus scans and maxIter cache reads). */
  def lloyd(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int = 10, tol: Double = 1e-4): KmeansModel = {
    require(k > 0 && maxIter >= 1, s"need k>0, maxIter>=1; got $k/$maxIter")
    val src = vecs
      .select(col(idCol), col(vecCol).cast("array<float>").as(vecCol))
      .filter(col(vecCol).isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents = md5Seeds(src, idCol, vecCol, k)
      var iter = 0
      var shift = Double.MaxValue
      while (iter < maxIter && shift > tol) {
        val next = step(src, idCol, vecCol, cents)
        shift = cents.zip(next).map { case ((_, a), (_, b)) =>
          var s = 0.0; var i = 0
          while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
          math.sqrt(s)
        }.max
        cents = next
        iter += 1
      }
      KmeansModel(cents, iter, shift)
    } finally src.unpersist()
  }

  /** Cluster assignment under a trained model — per-row codegen'd
    * expressions, map-only (shared with IVF so the two agree). */
  def assign(vecs: DataFrame, model: KmeansModel, idCol: String,
      vecCol: String): DataFrame =
    Ivf.assignTo(vecs, model.centroids, idCol, vecCol)

  /** An IVF index whose coarse quantizer was trained on the FULL corpus
    * (the trainCap-free path): distributed Lloyd, then the standard
    * assignment — drop-in for `Ivf.build` where index quality at scale
    * justifies maxIter corpus passes. */
  def buildIvf(vecs: DataFrame, idCol: String, vecCol: String, nlist: Int,
      maxIter: Int = 10, tol: Double = 1e-4): Ivf.IvfIndex = {
    val model = lloyd(vecs, idCol, vecCol, nlist, maxIter, tol)
    Ivf.IvfIndex(model.centroids,
      Ivf.assignTo(vecs, model.centroids, idCol, vecCol), idCol, vecCol)
  }
}
