package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  private val dim = 12

  // two fixed orthonormal directions; variance along u1 dominates, u2
  // second, everything else is small deterministic "noise" — so the
  // top-2 principal directions are known in advance
  private lazy val u1 = normalize(Array.tabulate(dim)(j => math.cos(j * 0.7)))
  private lazy val u2 = {
    val raw = Array.tabulate(dim)(j => math.sin(j * 1.3))
    val d = dot(raw, u1)
    normalize(raw.zipWithIndex.map { case (x, j) => x - d * u1(j) })
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  private lazy val vecs: DataFrame = {
    import spark.implicits._
    (0 until 400).map { i =>
      val t1 = 10.0 * math.sin(i * 0.37)       // big spread along u1
      val t2 = 3.0 * math.cos(i * 0.91)        // smaller along u2
      (i.toLong, Array.tabulate(dim) { j =>
        (1.5 + t1 * u1(j) + t2 * u2(j) +
          0.05 * math.sin(i * dim + j)).toFloat
      })
    }.toDF("vec_id", "embedding")
  }

  private def naiveCov(): (Array[Double], Array[Array[Double]], Long) = {
    val data = vecs.collect().map(_.getSeq[Float](1).toArray)
    val n = data.length.toLong
    val mean = Array.tabulate(dim)(j => data.map(_(j).toDouble).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      data.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
    }
    (mean, cov, n)
  }

  test("distributed moment pass matches the naive driver covariance") {
    val b = Pca.collectMoments(vecs, "embedding")
    val (mean, cov, n) = naiveCov()
    assert(b.n == n)
    val gotCov = Pca.covFromMoments(b)
    for (i <- 0 until dim) {
      assert(math.abs(b.sum(i) / b.n - mean(i)) < 1e-10, s"mean $i")
      for (j <- 0 until dim)
        assert(math.abs(gotCov(i)(j) - cov(i)(j)) < 1e-8, s"cov $i,$j")
    }
  }

  test("jacobiEigen: analytic 2x2 and diagonal cases") {
    val (v2, r2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(v2(0) - 3.0) < 1e-12 && math.abs(v2(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(r2(0)(0) - s) < 1e-12 && math.abs(r2(0)(1) - s) < 1e-12)
    // second vector sign-canonicalized: largest-|component| positive
    assert(math.abs(math.abs(r2(1)(0)) - s) < 1e-12)
    assert(r2(1)(0) * r2(1)(1) < 0) // orthogonal to the first
    val (vd, rd) = Pca.jacobiEigen(Array(
      Array(5.0, 0.0, 0.0), Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 9.0)))
    assert(vd.toSeq == Seq(9.0, 5.0, 2.0))
    assert(rd(0).toSeq == Seq(0.0, 0.0, 1.0))
    assert(rd(1).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("fit: orthonormal descending basis that diagonalizes the covariance") {
    val m = Pca.fit(vecs, "embedding", k = dim)
    assert(m.n == 400L && m.dim == dim && m.k == dim)
    // descending, non-negative (covariance is PSD)
    m.eigenvalues.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    assert(m.eigenvalues.last > -1e-9)
    assert(math.abs(m.varianceExplained - 1.0) < 1e-12)
    // B·Bᵀ = I
    for (i <- 0 until dim; j <- 0 until dim) {
      val e = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(m.basis(i), m.basis(j)) - e) < 1e-9, s"BBt $i,$j")
    }
    // B·C·Bᵀ = diag(λ)
    val (_, cov, _) = naiveCov()
    for (i <- 0 until dim; j <- 0 until dim) {
      val bicbj = dot(m.basis(i), Array.tabulate(dim)(c =>
        dot(cov(c), m.basis(j))))
      val want = if (i == j) m.eigenvalues(i) else 0.0
      assert(math.abs(bicbj - want) < 1e-6, s"BCBt $i,$j: $bicbj vs $want")
    }
    // the planted directions are recovered in order
    assert(math.abs(dot(m.basis(0), u1)) > 0.999, "top component ≠ u1")
    assert(math.abs(dot(m.basis(1), u2)) > 0.999, "second component ≠ u2")
  }

  test("DataFrame projection equals the driver-side matmul bit for bit") {
    val m = Pca.fit(vecs, "embedding", k = 5)
    val got = vecs
      .select(col("vec_id"), Pca.project(col("embedding"), m).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    vecs.collect().foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val x = Array.tabulate(dim)(i => v(i).toDouble - m.mean(i))
      val want = m.basis.map { row =>
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += x(i) * row(i); i += 1 }
        acc
      }
      assert(got(r.getLong(0)).toSeq == want.toSeq, s"row ${r.getLong(0)}")
    }
  }

  test("full-rank rotation preserves pairwise L2 distances") {
    val m = Pca.fit(vecs, "embedding", k = dim)
    val proj = vecs
      .select(col("vec_id"), Pca.project(col("embedding"), m).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val raw = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    for (i <- 0L until 20L; j <- (i + 1) to 20L) {
      val dRaw = l2(raw(i).map(_.toDouble), raw(j).map(_.toDouble))
      val dRot = l2(proj(i), proj(j))
      assert(math.abs(dRaw - dRot) < 1e-6 * math.max(1.0, dRaw),
        s"pair $i,$j: $dRaw vs $dRot")
    }
  }

  test("balancedOrder deals descending eigenvalues into variance-balanced subspaces") {
    val ev = Array.tabulate(16)(i => math.pow(0.7, i) * 100.0)
    val perm = Pca.balancedOrder(ev, m = 4)
    assert(perm.sorted.toSeq == (0 until 16))
    def spread(order: Array[Int]): Double = {
      val sums = order.grouped(4).map(_.map(i => math.log(ev(i))).sum).toSeq
      sums.max - sums.min
    }
    // strictly better than the naive contiguous split of the same dims
    assert(spread(perm) < spread((0 until 16).toArray))
    // deterministic
    assert(perm.toSeq == Pca.balancedOrder(ev, 4).toSeq)
  }

  test("pqRotation demands a full-rank model") {
    val m = Pca.fit(vecs, "embedding", k = 3)
    intercept[IllegalArgumentException] { Pca.pqRotation(m, 2) }
    val full = Pca.fit(vecs, "embedding", k = dim)
    val rot = Pca.pqRotation(full, m = 4)
    assert(rot.length == dim)
    // rows are still the model's basis rows, just permuted
    assert(rot.map(_.toSeq).toSet == full.basis.map(_.toSeq).toSet)
  }

  test("md5SignMatrix is deterministic ±1 and matches a direct digest") {
    val m = Pca.md5SignMatrix(4, 6)
    assert(m.flatten.forall(x => x == 1.0 || x == -1.0))
    assert(m.map(_.toSeq).toSeq == Pca.md5SignMatrix(4, 6).map(_.toSeq).toSeq)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("2_3".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = if (hex.charAt(0).toInt % 2 == 0) 1.0 else -1.0
    assert(m(2)(3) == want)
  }

  test("varianceExplained grows with k toward 1") {
    val v2 = Pca.fit(vecs, "embedding", k = 2).varianceExplained
    val v5 = Pca.fit(vecs, "embedding", k = 5).varianceExplained
    assert(v2 > 0.9, s"planted top-2 carry the variance, got $v2") // u1+u2 dominate
    assert(v5 >= v2 && v5 <= 1.0 + 1e-12)
  }

  test("whitening yields identity sample covariance (Mahalanobis frame)") {
    val m = Pca.fit(vecs, "embedding", k = 4) // the signal-carrying components
    val w = Pca.whitening(m)
    val rows = vecs
      .select(Pca.matVec(org.apache.spark.sql.functions.col("embedding"),
        w, m.mean).as("p"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = rows.length
    for (i <- 0 until 4; j <- 0 until 4) {
      val mean_i = rows.map(_(i)).sum / n
      val mean_j = rows.map(_(j)).sum / n
      val cov = rows.map(r => (r(i) - mean_i) * (r(j) - mean_j)).sum / (n - 1)
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov - want) < 1e-6, s"whitened cov $i,$j = $cov")
    }
    // degenerate directions pass through unscaled instead of exploding
    val flat = Pca.PcaModel(m.mean, m.basis, Array(4.0, 0.0, 1e-15, 1.0),
      m.n, m.totalVariance)
    val wf = Pca.whitening(flat)
    assert(wf(0).toSeq == m.basis(0).map(_ / 2.0).toSeq)
    assert(wf(1).toSeq == m.basis(1).toSeq)
    assert(wf(2).toSeq == m.basis(2).toSeq)
  }

  test("sampleFraction: deterministic md5-coin fit recovers the planted basis") {
    val s1 = Pca.fit(vecs, "embedding", k = 2, sampleFraction = 0.5,
      idCol = "vec_id")
    val s2 = Pca.fit(vecs, "embedding", k = 2, sampleFraction = 0.5,
      idCol = "vec_id")
    // same coin, same rows, same basis — bit for bit
    assert(s1.n == s2.n && s1.n < 400L && s1.n > 100L)
    assert(s1.basis.map(_.toSeq).toSeq == s2.basis.map(_.toSeq).toSeq)
    assert(s1.eigenvalues.toSeq == s2.eigenvalues.toSeq)
    // half the corpus still nails the planted directions
    assert(math.abs(dot(s1.basis(0), u1)) > 0.999)
    assert(math.abs(dot(s1.basis(1), u2)) > 0.99)
    intercept[IllegalArgumentException] {
      Pca.fit(vecs, "embedding", k = 2, sampleFraction = 0.5) // no idCol
    }
  }

  test("subspace-iteration fast path matches full Jacobi on the top-k pairs") {
    val (_, cov, _) = naiveCov()
    val (jv, jr) = Pca.jacobiEigen(cov)
    Pca.topKEigenSubspace(cov, 4) match {
      case Some((sv, sr)) =>
        for (i <- 0 until 4) {
          assert(math.abs(sv(i) - jv(i)) <= 1e-8 * math.max(1.0, jv(i)),
            s"eigval $i: ${sv(i)} vs ${jv(i)}")
          val cos = math.abs(sr(i).zip(jr(i)).map { case (a, b) => a * b }.sum)
          assert(cos > 1.0 - 1e-8, s"eigvec $i |cos|=$cos")
        }
      case None => fail("subspace iteration did not converge on a benign spectrum")
    }
    // the fit() fast path (k <= d/2) and the Jacobi path agree through
    // the public API too: same planted directions, same eigenvalues
    val fast = Pca.fit(vecs, "embedding", k = 2) // 2 <= 12/2 -> subspace
    val full = Pca.fit(vecs, "embedding", k = dim) // Jacobi
    for (i <- 0 until 2) {
      assert(math.abs(fast.eigenvalues(i) - full.eigenvalues(i)) <=
        1e-7 * full.eigenvalues(i))
      val cos = math.abs(dot(fast.basis(i), full.basis(i)))
      assert(cos > 1.0 - 1e-7, s"component $i |cos|=$cos")
    }
    // varianceExplained denominators agree (trace == eigenvalue sum)
    assert(math.abs(fast.totalVariance - full.totalVariance) <=
      1e-9 * full.totalVariance)
  }

  test("review fixes: sub-1 eigenvalues, coin resolution, null elements") {
    // balancedOrder must be SCALE-invariant: for unit-normalized
    // embeddings every eigenvalue is < 1 and the raw-log greedy
    // degenerated to the contiguous split (r13e review finding)
    val small = Array(0.4, 0.3, 0.2, 0.1)
    assert(Pca.balancedOrder(small, 2).toSeq == Seq(0, 3, 1, 2))
    assert(Pca.balancedOrder(small.map(_ * 1000.0), 2).toSeq ==
      Pca.balancedOrder(small, 2).toSeq)
    // the md5 coin rounds (not floors) and rejects sub-resolution asks
    intercept[IllegalArgumentException] {
      Pca.fit(vecs, "embedding", k = 2, sampleFraction = 0.001,
        idCol = "vec_id")
    }
    // a vector with a null ELEMENT is excluded, not an executor NPE
    import spark.implicits._
    val dirty = vecs.unionByName(
      Seq((9999L, Array[java.lang.Float](java.lang.Float.valueOf(1f), null,
        java.lang.Float.valueOf(2f)) ++
        Array.fill(dim - 3)(java.lang.Float.valueOf(0f))))
        .toDF("vec_id", "embedding"))
    val b = Pca.collectMoments(dirty, "embedding")
    assert(b.n == 400L) // the dirty row contributed nothing
  }

  test("fitGramFree matches the Jacobi fit on a planted spectrum (top-k pairs)") {
    import spark.implicits._
    // anisotropic by construction: per-dim geometric decay so the
    // top-4 eigengaps are real and the subspace iteration converges
    val dim = 24
    val vecs = (0 until 600).map { i =>
      (i.toLong, Array.tabulate(dim) { j =>
        (math.pow(0.7, j) *
          (((i * (j + 1) * 2654435761L) % 10007) / 10007.0 - 0.5)).toFloat
      })
    }.toDF("vec_id", "embedding")
    val jac = Pca.fit(vecs, "embedding", k = 4)
    val gf = Pca.fitGramFree(vecs, "embedding", k = 4, tol = 1e-9)
    assert(gf.n == jac.n)
    assert(math.abs(gf.totalVariance - jac.totalVariance)
      <= 1e-9 * jac.totalVariance)
    gf.eigenvalues.zip(jac.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-6 * math.max(b, 1e-12), s"$a vs $b")
    }
    // same 1-D eigenspaces: |cos| of each basis-row pair ≈ 1, and the
    // shared sign canonicalization makes them EQUAL up to tolerance
    gf.basis.zip(jac.basis).foreach { case (a, b) =>
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) > 1.0 - 1e-6, s"basis misaligned: |cos|=$dot")
      assert(dot > 0, "sign canonicalization diverged between solvers")
    }
    // the probe-step frame is finite and shaped (i < maxDim) x k
    val ps = Pca.powerStepDf(vecs, "embedding", k = 3, maxDim = 5).collect()
    assert(ps.length == 15 && ps.forall(r => !r.getDouble(2).isNaN))
  }

  test("moment pass fails fast past MaxMomentDim with the JL-first remediation") {
    // the r13 watch item: the d(d+3)/2 buffer has an explicit ceiling;
    // the guard must fire BEFORE allocating the oversized buffer and
    // name the escape hatch (JL-project first). Two thin rows suffice —
    // the require trips on the first vector's length.
    import spark.implicits._
    val wide = Seq(1L, 2L).map(i =>
      (i, Array.fill(Pca.MaxMomentDim + 1)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.fit(wide, "embedding", k = 2)
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    val msg = causes(e).map(_.getMessage).mkString(" | ")
    assert(msg.contains(s"dim <= ${Pca.MaxMomentDim}"), msg)
    assert(msg.contains("md5SignMatrix"), msg)
  }
}
