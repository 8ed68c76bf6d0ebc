package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Pca

/** Modern-embedding-dims probe for the PCA moment pass (the r13
  * verdict's watch item): d=1536 and d=4096 at 1M rows — the regimes
  * of text-embedding-3-large-class models — measuring exactly what the
  * [[graft.similarity.Pca.CovBuf]] sizing table documents:
  *
  *   - the ONE moment pass (per-task buffer d(d+3)/2 doubles — 9.5 MB
  *     at 1536, 67 MB at 4096 — merged across one narrow exchange),
  *     timed full-corpus AND at the 6.25% md5-coin sample `fit`
  *     recommends for wide dims (compute is O(d²/2) per ROW; the
  *     buffer is per-TASK and unchanged by sampling);
  *   - the driver eigensolve for k=16 via the subspace fast path, on a
  *     planted decaying spectrum (top-16 geometric decay — flat-tail
  *     synthetic noise would push the solver to full Jacobi, which at
  *     d=4096 is exactly what the k ≪ d path exists to avoid);
  *   - the map-only projection pass through the fused MatVecProject
  *     kernel (k×d constant — 0.5 MB of plan at d=4096, k=16).
  *
  * Usage: tools/run_main.sh graft.tools.PcaWideProbe [n] [dimsCsv]
  *        (defaults 1,000,000 and "1536,4096"; SPARK_DRIVER_MEM=48g).
  */
object PcaWideProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dimsList = args.lift(1).getOrElse("1536,4096")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tsec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    dimsList.foreach { d =>
      val bufMb = d.toLong * (d + 3) / 2 * 8 / 1e6
      println(f"== d=$d: buffer ${bufMb}%.1f MB/task " +
        f"(x32 tasks = ${bufMb * 32 / 1000}%.1f GB working set) ==")
      // planted spectrum: top-24 dims decay 2x per dim (fast subspace
      // convergence for k=16), flat small tail — deterministic hash noise
      val vecs = spark.range(n)
        .select(col("id").as("vec_id"),
          // xxhash64 noise: a linear id*j*C product overflows BIGINT
          // under ANSI mode at d=4096 (10^6 × 4096 × 2.65e9 > 2^63)
          expr(s"""transform(sequence(1, $d), j -> cast(
              (CASE WHEN j > 24 THEN 5.9604644775390625e-8
                    ELSE pow(0.5, j) END) *
              (pmod(xxhash64(id, j), 10007) / 10007.0 - 0.5) AS float))""")
            .as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (_, tGen) = tsec(vecs.count())
      println(f"generate+materialize: $tGen%.1f s ($n x $d float)")

      val (mFull, tFull) = tsec(Pca.fit(vecs, "embedding", k = 16))
      println(f"fit full corpus:      $tFull%.1f s " +
        f"(n=${mFull.n}, varExplained=${mFull.varianceExplained}%.3f)")

      val (mSamp, tSamp) = tsec(Pca.fit(vecs, "embedding", k = 16,
        sampleFraction = 0.0625, idCol = "vec_id"))
      println(f"fit 6.25%% md5 sample: $tSamp%.1f s (n=${mSamp.n})")
      // sample estimate agrees with full fit in the planted directions:
      // compare per-component absolute eigenvalue ratios
      val ratios = mFull.eigenvalues.zip(mSamp.eigenvalues)
        .take(8).map { case (a, b) => b / a }
      println("sample/full eigenvalue ratios (top 8): " +
        ratios.map(r => f"$r%.3f").mkString(", "))
      require(ratios.forall(r => r > 0.9 && r < 1.1),
        "sampled moment estimate drifted >10% on the planted spectrum")

      val (s, tProj) = tsec(
        vecs.select(Pca.project(col("embedding"), mFull).as("p"))
          .agg(sum(element_at(col("p"), 1))).collect().head.getDouble(0))
      println(f"project k=16 (map-only fused kernel): $tProj%.1f s " +
        f"(checksum ${s}%.3f, ${n / tProj / 1e6}%.2f M rows/s)")
      vecs.unpersist(true)
      println()
    }
    spark.stop()
  }
}
