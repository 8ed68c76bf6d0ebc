package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Pca

/** `Pca.fitGramFree` probed IN ITS OWN REGIME (the r14 verdict's ask
  * #4): dimensions past `MaxMomentDim` = 16384, where the d²/2 moment
  * buffer (34 GB at d=65536, 8.6 GB at d=32768) is impossible and
  * subspace iteration on the covariance action — O(d·k) task state —
  * is the only distributed path this engine (or any) has.
  *
  * The corpus is a PLANTED low-rank model with an exactly computable
  * spectrum: x_i = Σ_j a_j·c_ij·u_j with kTrue md5-derived ±1/√d
  * direction rows U, geometric amplitudes a_j = 8·0.75^j, and
  * deterministic ±1 coins c_ij (splitmix64 — shared by the generator
  * and the reference). Because X = C·U (n×kTrue times kTrue×d), the
  * sample covariance is Uᵀ·B·U with B the kTrue×kTrue centered
  * coefficient second-moment matrix, and its NONZERO eigenvalues are
  * exactly those of G^{1/2}·B·G^{1/2} where G = U·Uᵀ — both kTrue² and
  * computed exactly on the driver (B from the coins, G from U; a
  * 16×16 Jacobi closes it). The md5 directions are NOT assumed
  * orthogonal — G carries their true Gram — so the reference is exact
  * up to the generator's float32 rounding (~1e-7 relative), and the
  * probe asserts fitGramFree's top-k eigenvalues within 1e-3 relative.
  *
  * Measured separately: one sweep-kernel pass (`powerStepDf`, the
  * exact per-sweep corpus pass), the full fit (sweeps × passes +
  * driver Rayleigh–Ritz), and the projection pass. Task state is
  * printed against the moment buffer it replaces.
  *
  * Usage: tools/run_main.sh graft.tools.GramFreeProbe
  *        [n] [d] [kTrue] [k] (defaults 100,000 × 32768, 16 planted,
  *        fit k=8; ~13 GB parquet under target/, deleted on success;
  *        SPARK_DRIVER_MEM=48g recommended).
  */
object GramFreeProbe {

  /** Deterministic ±1 coin for (row, component) — splitmix64 finisher. */
  private def coin(i: Long, j: Int): Double = {
    var z = i * 1000003L + j + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** md5 ±1/√d direction rows — the engine's own sign-matrix idiom. */
  private def directions(kTrue: Int, d: Int): Array[Array[Double]] =
    Array.tabulate(kTrue, d) { (j, i) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"gf_${j}_$i".getBytes("UTF-8"))
      (if ((h(0) & 1) == 0) 1.0 else -1.0) / math.sqrt(d.toDouble)
    }

  /** Plain cyclic Jacobi for a small symmetric matrix; eigenvalues
    * descending. Driver-side, kTrue×kTrue only. */
  private def smallEigen(a0: Array[Array[Double]]): Array[Double] = {
    val n = a0.length
    val a = a0.map(_.clone())
    var sweep = 0
    var off = 1.0
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > 1e-15) {
          val theta = 0.5 * math.atan2(2 * a(p)(q), a(q)(q) - a(p)(p))
          val c = math.cos(theta)
          val s = math.sin(theta)
          for (i <- 0 until n) {
            val aip = a(i)(p)
            val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until n) {
            val api = a(p)(i)
            val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
          }
        }
      }
      sweep += 1
    }
    (0 until n).map(i => a(i)(i)).toArray.sorted.reverse
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val d = args.lift(1).map(_.toInt).getOrElse(32768)
    val kTrue = args.lift(2).map(_.toInt).getOrElse(16)
    val k = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      // at d=32768 the DEFAULT vectorized-reader batch (4096 rows) is
      // 0.5 GB of column vector PER TASK (4096·32768·4B) — 17 GB across
      // 32 local threads, an instant OOM. 256-row batches hold the
      // whole-scan working set at ~1 GB; the same knob a real cluster
      // job at these dims must set (documented in fitGramFree's doc).
      .config("spark.sql.parquet.columnarReaderBatchSize", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def tsec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val momentMb = d.toLong * (d + 3) / 2 * 8 / 1e6
    println(f"== n=$n x d=$d (planted kTrue=$kTrue, fit k=$k) ==")
    println(f"moment buffer this dim would need: ${momentMb / 1000}%.1f GB/task " +
      f"(MaxMomentDim=16384 fails fast); gram-free task state: " +
      f"${d.toLong * k * 8 / 1e6}%.1f MB")

    val u = directions(kTrue, d)
    val amps = Array.tabulate(kTrue)(j => 8.0 * math.pow(0.75, j))
    val bcU = spark.sparkContext.broadcast(u)
    val bcA = spark.sparkContext.broadcast(amps)
    val path = "target/gramfree_probe"
    val (_, tGen) = tsec {
      spark.range(n).select(col("id"))
        .as[Long]
        .mapPartitions { it =>
          val uu = bcU.value
          val aa = bcA.value
          it.map { i =>
            val x = new Array[Double](d)
            var j = 0
            while (j < kTrue) {
              val w = aa(j) * coin(i, j)
              val uj = uu(j)
              var t = 0
              while (t < d) { x(t) += w * uj(t); t += 1 }
              j += 1
            }
            (i, x.map(_.toFloat))
          }
        }
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(path)
    }
    println(f"generate+write: $tGen%.1f s (${n * d.toLong * 4 / 1e9}%.1f GB raw floats)")
    val vecs = spark.read.parquet(path)

    // exact reference spectrum: B from the coins, G from U, 16x16 Jacobi
    val (ref, tRef) = tsec {
      val m = Array.ofDim[Double](kTrue, kTrue)
      val mean = new Array[Double](kTrue)
      var i = 0L
      while (i < n) {
        var j = 0
        while (j < kTrue) {
          val wj = amps(j) * coin(i, j)
          mean(j) += wj
          var l = j
          while (l < kTrue) { m(j)(l) += wj * amps(l) * coin(i, l); l += 1 }
          j += 1
        }
        i += 1
      }
      val b = Array.tabulate(kTrue, kTrue) { (j, l) =>
        val (jj, ll) = if (j <= l) (j, l) else (l, j)
        (m(jj)(ll) - mean(j) * mean(l) / n) / (n - 1).toDouble
      }
      val g = Array.tabulate(kTrue, kTrue) { (j, l) =>
        var acc = 0.0
        var t = 0
        while (t < d) { acc += u(j)(t) * u(l)(t); t += 1 }
        acc
      }
      // G^(1/2) via its own small eigendecomposition (Jacobi with vectors)
      val (gv, gvec) = jacobiWithVectors(g)
      val gh = Array.tabulate(kTrue, kTrue) { (r, c) =>
        var acc = 0.0
        var t = 0
        while (t < kTrue) {
          acc += gvec(t)(r) * math.sqrt(math.max(gv(t), 0.0)) * gvec(t)(c)
          t += 1
        }
        acc
      }
      def mul(x: Array[Array[Double]], y: Array[Array[Double]]) =
        Array.tabulate(kTrue, kTrue) { (r, c) =>
          var acc = 0.0
          var t = 0
          while (t < kTrue) { acc += x(r)(t) * y(t)(c); t += 1 }
          acc
        }
      smallEigen(mul(mul(gh, b), gh))
    }
    println(f"reference spectrum (driver, exact): $tRef%.1f s; top-$k: " +
      ref.take(k).map(v => f"$v%.4f").mkString(", "))

    // one sweep-kernel corpus pass (the exact per-sweep cost)
    val (_, tSweep) = tsec(
      Pca.powerStepDf(vecs, "embedding", k = k, maxDim = 1).collect())
    println(f"one sweep-kernel pass (powerStepDf, k=$k): $tSweep%.1f s")

    val (model, tFit) = tsec(
      Pca.fitGramFree(vecs, "embedding", k = k, maxSweeps = 60, tol = 1e-5,
        verbose = true))
    println(f"fitGramFree: $tFit%.1f s total (Ritz-checked residuals above; " +
      f"Rayleigh-Ritz every 5 sweeps)")
    val ratios = model.eigenvalues.zip(ref.take(k)).map { case (a, b) => a / b }
    println("fit/reference eigenvalue ratios: " +
      ratios.map(r => f"$r%.5f").mkString(", "))
    require(ratios.forall(r => math.abs(r - 1.0) < 1e-3),
      "gram-free eigenvalues drifted >0.1% off the planted reference")
    println("eigenvalues agree with the exact planted reference (<0.1%)")

    val (cnt, tProj) = tsec(
      vecs.select(Pca.project(col("embedding"), model).as("p"))
        .filter(size(col("p")) === k).count())
    println(f"project (fused kernel, map-only): $tProj%.1f s ($cnt rows)")

    // clean the 13 GB on success; a failed run leaves it for inspection
    val dir = new java.io.File(path)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(dir)
    println("probe data deleted")
    spark.stop()
  }

  /** Jacobi with accumulated eigenvectors (rows of the returned
    * matrix), for G^(1/2); kTrue×kTrue driver-side only. */
  private def jacobiWithVectors(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = 1.0
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > 1e-15) {
          val theta = 0.5 * math.atan2(2 * a(p)(q), a(q)(q) - a(p)(p))
          val c = math.cos(theta)
          val s = math.sin(theta)
          for (i <- 0 until n) {
            val aip = a(i)(p)
            val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until n) {
            val api = a(p)(i)
            val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
            val vpi = v(p)(i)
            val vqi = v(q)(i)
            v(p)(i) = c * vpi - s * vqi
            v(q)(i) = s * vpi + c * vqi
          }
        }
      }
      sweep += 1
    }
    ((0 until n).map(i => a(i)(i)).toArray, v)
  }
}
