package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class CoresetSpec extends SparkSpec {

  private val dim = 8

  // four well-separated clusters (the KmeansSpec corpus shape): a k=4
  // farthest-point sweep must land one pick in each
  private lazy val vecs: DataFrame = {
    import spark.implicits._
    (0L until 120L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(dim)(j =>
        (if (j == c * 2) 20f else 0f) + (math.sin(i * dim + j) * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def collectVecs(): Array[(Long, Array[Double])] =
    vecs.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

  /** Driver-side greedy reference with the identical seed rule and
    * tie-breaks (direct (x−y)² distances — algebraically equal to the
    * library's norm−2·score form; well-separated data keeps fp noise
    * away from any near-tie). */
  private def refSelect(data: Array[(Long, Array[Double])],
      k: Int): Seq[(Long, Double)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seed = data.minBy { case (id, _) => (md5hex(id.toString), id) }
    var chosen = List((seed._1, 0.0))
    var chosenVecs = List(seed._2)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (_ <- 1 until k) {
      val far = data
        .map { case (id, v) => (id, v, chosenVecs.map(d2(v, _)).min) }
        .minBy { case (id, _, md) => (-md, id) }
      chosen ::= (far._1, far._3)
      chosenVecs ::= far._2
    }
    chosen.reverse
  }

  test("greedy selection matches the driver reference (ids exact, distances ~)") {
    val got = Coreset.select(vecs, "vec_id", "embedding", k = 6)
    val want = refSelect(collectVecs(), 6)
    assert(got.map(_.id) == want.map(_._1), "pick order differs")
    got.zip(want).foreach { case (p, (_, md)) =>
      assert(math.abs(p.minDistSq - md) <= 1e-9 * math.max(1.0, md),
        s"rank ${p.rank}: ${p.minDistSq} vs $md")
    }
    assert(got.map(_.rank) == (0 until 6))
  }

  test("k=4 covers all four planted clusters; distances non-increasing") {
    val picks = Coreset.select(vecs, "vec_id", "embedding", k = 4)
    assert(picks.map(_.id.asInstanceOf[Long] % 4).toSet.size == 4,
      s"picks ${picks.map(_.id)} miss a cluster")
    val mds = picks.drop(1).map(_.minDistSq)
    mds.sliding(2).foreach { case Seq(a, b) => assert(a >= b, s"$a < $b") }
    // deterministic
    assert(Coreset.select(vecs, "vec_id", "embedding", k = 4)
      .map(p => (p.rank, p.id)) == picks.map(p => (p.rank, p.id)))
  }

  test("radiusSq: one more pass, bounded by the last pick's distance") {
    val picks = Coreset.select(vecs, "vec_id", "embedding", k = 4)
    val r = Coreset.radiusSq(vecs, "vec_id", "embedding", picks)
    // adding the k-th center can only shrink coverage distance
    assert(r <= picks.last.minDistSq + 1e-9)
    assert(r > 0.0) // 30 rows per cluster, only 4 centers
    // intra-cluster spread is tiny vs the 20-unit cluster separation
    assert(r < 100.0, s"radius² $r should be intra-cluster scale")
  }

  test("null vectors are excluded; k=1 returns just the md5 seed") {
    import spark.implicits._
    val withNull = vecs.unionByName(
      Seq((999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val one = Coreset.select(withNull, "vec_id", "embedding", k = 1)
    assert(one.length == 1 && one.head.rank == 0 && one.head.minDistSq == 0.0)
    assert(one.head.id != 999L)
  }

  test("k beyond distinct-vector diversity fails loudly; null elements excluded") {
    import spark.implicits._
    // 3 distinct vectors, 5 rows (duplicates), k=5 would re-pick an id
    val dup = (0L until 5L).map(i =>
      (i, Array.tabulate(4)(j => ((i % 3) * 10 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val ok = Coreset.select(dup, "vec_id", "embedding", k = 3)
    assert(ok.map(_.id).distinct.size == 3)
    val ex = intercept[IllegalArgumentException] {
      Coreset.select(dup, "vec_id", "embedding", k = 5)
    }
    assert(ex.getMessage.contains("diversity"))
    // a null ELEMENT row neither crashes nor gets picked
    val dirty = vecs.unionByName(
      Seq((9999L, Array[java.lang.Float](null) ++
        Array.fill(dim - 1)(java.lang.Float.valueOf(99f))))
        .toDF("vec_id", "embedding"))
    val picks = Coreset.select(dirty, "vec_id", "embedding", k = 4)
    assert(!picks.exists(_.id == 9999L))
  }
}
