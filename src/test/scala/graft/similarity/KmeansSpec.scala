package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpec {

  // three well-separated clusters in 8-d (IvfSpec's corpus shape)
  private lazy val vecs = {
    import spark.implicits._
    (0L until 90L).map { i =>
      val c = (i % 3).toInt
      val base = Array.tabulate(8)(j => if (j == c * 2) 10f else 0f)
      (i, base.zipWithIndex.map { case (x, j) =>
        x + (math.sin(i * 8 + j) * 0.3).toFloat })
    }.toDF("vec_id", "embedding")
  }

  private def collectVecs(): Array[(Long, Array[Float])] =
    vecs.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Driver-side reference for one Lloyd update under the SAME
    * assignment rule (argmax of dot − ‖c‖²/2, ties → lowest list). */
  private def refStep(data: Array[(Long, Array[Float])],
      cents: Seq[(Int, Array[Float])]): Map[Int, (Array[Double], Long)] = {
    val acc = scala.collection.mutable.Map[Int, (Array[Double], Long)]()
    data.foreach { case (_, v) =>
      var bi = -1; var bs = Double.NegativeInfinity
      cents.foreach { case (li, c) =>
        var dot = 0.0; var nrm = 0.0; var j = 0
        while (j < c.length) {
          dot += v(j).toDouble * c(j); nrm += c(j).toDouble * c(j); j += 1
        }
        val s = dot - nrm / 2
        if (s > bs) { bs = s; bi = li } // strict: ties keep LOWEST list
      }
      val (sum, n) = acc.getOrElse(bi, (new Array[Double](v.length), 0L))
      var j = 0
      while (j < v.length) { sum(j) += v(j); j += 1 }
      acc(bi) = (sum, n + 1)
    }
    acc.toMap
  }

  test("distributed step matches the driver-side reference update") {
    val seeds = Kmeans.md5Seeds(vecs, "vec_id", "embedding", k = 3)
    val got = Kmeans.step(vecs, "vec_id", "embedding", seeds).toMap
    val ref = refStep(collectVecs(), seeds)
    assert(got.keySet == Set(0, 1, 2))
    (0 to 2).foreach { li =>
      val (sum, n) = ref(li)
      val exp = sum.map(x => (x / n).toFloat)
      got(li).zip(exp).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5f, s"list $li: $a vs $b")
      }
    }
  }

  test("a centroid with no assigned vectors keeps its previous value") {
    // a far-away phantom centroid attracts nothing (its ‖c‖²/2 penalty
    // dominates any dot product against the corpus)
    val far = Array.fill(8)(1e6f)
    val seeds = Kmeans.md5Seeds(vecs, "vec_id", "embedding", k = 2) :+ (2 -> far)
    val next = Kmeans.step(vecs, "vec_id", "embedding", seeds).toMap
    assert(next(2).toSeq == far.toSeq)
  }

  test("lloyd converges on separated clusters and recovers them") {
    val model = Kmeans.lloyd(vecs, "vec_id", "embedding", k = 3,
      maxIter = 10, tol = 1e-6)
    assert(model.iters <= 10 && model.centroids.size == 3)
    assert(model.lastShift <= 1e-6,
      s"did not converge: shift=${model.lastShift} after ${model.iters}")
    // each recovered centroid has its cluster's signature spike ≈10 on
    // exactly one even dimension
    val spikes = model.centroids.map { case (_, c) =>
      c.zipWithIndex.filter(_._1 > 5f) match {
        case Array((x, j)) => assert(x > 9f && x < 11f); j
      }
    }.toSet
    assert(spikes == Set(0, 2, 4))
    // assignment is balanced 30/30/30 (the synthetic truth)
    val sizes = Kmeans.assign(vecs, model, "vec_id", "embedding")
      .groupBy("list_id").count().collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(30L, 30L, 30L))
  }

  test("buildIvf searches like a trainCap IVF on the same corpus") {
    import spark.implicits._
    val index = Kmeans.buildIvf(vecs, "vec_id", "embedding", nlist = 3,
      maxIter = 10)
    val q = vecs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val full = Ivf.search(index, q, k = 4, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Knn.bruteForceTopK(q, vecs, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)
  }
}
