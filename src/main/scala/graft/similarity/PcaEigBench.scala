package graft.similarity

/** Driver-side microbench for the two eigensolver paths `Pca.fit`
  * chooses between (lives in this package for access to the private
  * solvers): builds a d×d PSD matrix with a planted geometric spectrum
  * `0.02·decay^i + 1e-4` and times `topKEigenSubspace(k)` vs full
  * `jacobiEigen`. The decay knob sweeps the regime boundary: near 1
  * the spectrum is flat, the subspace iteration's projected-cost guard
  * bails in ~2 s and Jacobi does the work; at realistic decays the
  * fast path converges in seconds where Jacobi takes ~a minute.
  *
  * Usage: tools/run_main.sh graft.similarity.PcaEigBench [d] [k] [decay ...]
  * (defaults 768, 16, "0.999 0.97 0.93 0.85").
  */
object PcaEigBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.map(_.toInt).getOrElse(768)
    val k = args.lift(1).map(_.toInt).getOrElse(16)
    val decays = if (args.length > 2) args.drop(2).map(_.toDouble).toSeq
      else Seq(0.999, 0.97, 0.93, 0.85)
    // fixed orthonormal frame (seeded — the bench is deterministic)
    val rnd = new scala.util.Random(7)
    val frame = Array.fill(d, d)(rnd.nextGaussian())
    for (j <- 0 until d) {
      for (jj <- 0 until j) {
        var dp = 0.0
        for (i <- 0 until d) dp += frame(i)(j) * frame(i)(jj)
        for (i <- 0 until d) frame(i)(j) -= dp * frame(i)(jj)
      }
      val n = math.sqrt((0 until d).map(i => frame(i)(j) * frame(i)(j)).sum)
      for (i <- 0 until d) frame(i)(j) /= n
    }
    def tsec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (decay <- decays) {
      val evs = Array.tabulate(d)(i => 0.02 * math.pow(decay, i) + 1e-4)
      val a = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        var s = 0.0
        for (c <- 0 until d) s += frame(i)(c) * evs(c) * frame(j)(c)
        a(i)(j) = s; a(j)(i) = s
      }
      val (sub, tS) = tsec(Pca.topKEigenSubspace(a, k))
      val (_, tJ) = tsec(Pca.jacobiEigen(a))
      val verdict = sub match {
        case Some((v, _)) =>
          f"converged, top=${v.head}%.6f (true ${evs.head}%.6f)"
        case None => "bailed to Jacobi (guard)"
      }
      println(f"decay=$decay%.3f d=$d k=$k: subspace $tS%.2f s [$verdict], " +
        f"full Jacobi $tJ%.2f s")
    }
  }
}
