package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

import graft.expressions.MatVecProject

/** Distributed PCA over an embedding column — the linear
  * dimensionality-reduction layer of an embedding pipeline (truncate
  * before clustering/ANN, decorrelate/balance before PQ, drift
  * monitoring in a compact basis).
  *
  * Dataflow shape (the only part that touches the corpus): ONE
  * map-side pass accumulating a fixed-size second-moment buffer — the
  * per-dimension sum plus the packed upper triangle of Σ vᵢvⱼ,
  * d(d+3)/2 doubles total (~17 KB at d=64) — combined per partition by
  * the typed Aggregator and merged across partitions by one narrow
  * exchange whose payload is ONE buffer row per map partition. The
  * vectors themselves never shuffle; nothing grows with row count. At
  * 100 TB this is exactly a `q_counts`-class aggregation: corpus scan
  * + buffer merge + a single ~17 KB driver collect.
  *
  * The d×d eigendecomposition happens on the DRIVER (cyclic Jacobi —
  * deterministic, no randomness, O(d³) at d≤a few thousand is
  * microseconds-to-seconds and independent of corpus size), mirroring
  * `Ivf.build`'s driver-side quantizer training: the cluster computes
  * what scales with DATA, the driver computes what scales with DIM.
  * Projection back over the corpus is map-only through the fused
  * [[graft.expressions.MatVecProject]] kernel (constant generated-code
  * size — see NearestList's huge-method story).
  *
  * Oracle gating (the repo's standard split for trained operators):
  * the distributed stats pass is SQL-expressible and hash-gated in
  * `q_pca_cov`; the projection KERNEL is gated end-to-end in
  * `q_jl_project` with an engine-neutral md5-derived ±1 matrix (both
  * engines derive the same matrix from the same hex digits); the
  * eigensolver is spec-gated (known matrices, orthonormality,
  * diagonalization, agreement with a naive O(n·d²) reference on real
  * rows) since eigenvectors are not SQL-expressible.
  *
  * Reference scope: vector-io ships no dimensionality reduction; this
  * is the beyond-parity training-data layer (SURVEY §7.5), sited with
  * the other embedding-geometry trainers (Ivf/Pq/Kmeans).
  */
object Pca {

  /** Raw-moment buffer: per-dim sums, packed upper-triangle Σ vᵢvⱼ
    * (index `i*d − i(i−1)/2 + (j−i)` for i ≤ j), row count.
    *
    * SIZING (the explicit bound the one-pass design trades on): the
    * buffer is d(d+3)/2 doubles per concurrent task —
    * ~17 KB at d=64, 2.4 MB at d=768, 9.5 MB at d=1536, 67 MB at
    * d=4096, 1.1 GB at d=16384 — plus one serialized copy per map
    * partition crossing the single narrow exchange. At 32 concurrent
    * tasks that is ~0.3 GB of executor heap at d=1536 and ~2.1 GB at
    * d=4096: real but workable on production executors, and probed at
    * 1M rows for both dims (pca_wide_probe_r14.txt). Past
    * [[MaxMomentDim]] the packed-triangle design is the wrong tool
    * (the buffer itself outgrows a task's working set long before the
    * Int index space runs out at d≈65k) and `fit` fails fast with the
    * remediation: JL-project down first through the SAME fused kernel
    * (`matVec` with [[md5SignMatrix]] — distance-preserving at these
    * dims by Johnson–Lindenstrauss, and the composition
    * PCA(JL(x)) is the standard two-stage reduction), then fit in the
    * reduced space. Compute per row is O(d²/2) multiplies — the reason
    * `fit(sampleFraction)` exists (the covariance is an average; a
    * 1–10% md5-coin sample estimates a d² matrix far beyond
    * quantizer-training accuracy). */
  final case class CovBuf(sum: Array[Double], prods: Array[Double], n: Long)

  /** Hard ceiling on the moment-pass dimensionality: at d=16384 the
    * buffer is ~1.1 GB per task — the practical edge of the one-pass
    * design; see [[CovBuf]] for the sizing table and the JL-first
    * remediation the error message points at. */
  final val MaxMomentDim = 16384

  /** Packed upper-triangle index for i ≤ j in dimension d. */
  @inline private[similarity] def triIdx(i: Int, j: Int, d: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)

  /** Elementwise second-moment accumulation over Array[Float] rows.
    * Null/empty rows are skipped; dimensions are fixed by the first
    * non-null vector (ragged inputs fail fast — same contract as
    * `VectorAggregates.ElementwiseStats`). */
  object CovStats extends Aggregator[Seq[Float], CovBuf, CovBuf] {
    override def zero: CovBuf = CovBuf(Array.empty, Array.empty, 0L)

    private def init(v: Seq[Float]): CovBuf = {
      val d = v.length
      require(d <= MaxMomentDim,
        s"moment pass supports dim <= $MaxMomentDim (got $d): the packed " +
          s"second-moment buffer is d(d+3)/2 doubles = " +
          f"${d.toLong * (d + 3) / 2 * 8 / 1e9}%.1f GB per task at this dim. " +
          "JL-project to a lower dim first (Pca.matVec with " +
          "Pca.md5SignMatrix), then fit in the reduced space.")
      val b = CovBuf(new Array[Double](d), new Array[Double](d * (d + 1) / 2), 0L)
      accumulate(b, v)
    }

    private def accumulate(b: CovBuf, v: Seq[Float]): CovBuf = {
      val d = b.sum.length
      // materialize once: Seq#apply on the row wrapper is not O(1)-safe
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = v(i).toDouble; i += 1 }
      i = 0
      while (i < d) {
        b.sum(i) += x(i)
        val base = triIdx(i, i, d)
        var j = i
        while (j < d) {
          b.prods(base + (j - i)) += x(i) * x(j)
          j += 1
        }
        i += 1
      }
      CovBuf(b.sum, b.prods, b.n + 1L)
    }

    override def reduce(b: CovBuf, v: Seq[Float]): CovBuf =
      if (v == null || v.isEmpty) b
      else if (b.n == 0L) init(v)
      else {
        require(v.length == b.sum.length,
          s"ragged vectors: ${v.length} vs ${b.sum.length}")
        accumulate(b, v)
      }

    override def merge(a: CovBuf, b: CovBuf): CovBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sum.length == b.sum.length,
          s"ragged buffers: ${a.sum.length} vs ${b.sum.length}")
        var i = 0
        while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
        i = 0
        while (i < a.prods.length) { a.prods(i) += b.prods(i); i += 1 }
        CovBuf(a.sum, a.prods, a.n + b.n)
      }

    override def finish(b: CovBuf): CovBuf = b
    override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    override def outputEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    // plan renderings print the aggregator instance — the default
    // object@hashcode churns EXPLAIN.md on every regeneration
    override def toString: String = "graft.Pca.CovStats"
  }

  /** Untyped handle: `df.agg(covStats(col("vec")))` →
    * struct<sum:array<double>, prods:array<double>, n:bigint>. */
  val covStats: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(CovStats)

  /** The ONE moment-pass frame — shared by `collectMoments` (what
    * `fit` consumes) and `covarianceDf` (what `q_pca_cov` gates), so
    * the two can never drift. Rows with a null vector OR any null
    * ELEMENT are excluded: a partially-null vector is not a usable
    * observation of the joint second moment (same whole-row-null
    * stance as MatVecProject), and without the filter the Seq[Float]
    * deserializer would NPE on the first null element. */
  private def momentsFrame(vecs: DataFrame, vecCol: String): DataFrame =
    vecs.select(col(vecCol).cast("array<float>").as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), _.isNull))
      .agg(covStats(col("__v")).as("st"))
      .select(col("st.sum").as("sum"), col("st.prods").as("prods"),
        col("st.n").as("n"))

  /** The one corpus pass, collected: raw moments on the driver. */
  private[similarity] def collectMoments(vecs: DataFrame, vecCol: String): CovBuf = {
    val row = momentsFrame(vecs, vecCol).head()
    CovBuf(row.getSeq[Double](0).toArray, row.getSeq[Double](1).toArray,
      row.getLong(2))
  }

  /** Sample covariance (Bessel-corrected) from raw moments:
    * cov(i,j) = (Σvᵢvⱼ − ΣvᵢΣvⱼ/n) / (n−1). */
  private[similarity] def covFromMoments(b: CovBuf): Array[Array[Double]] = {
    require(b.n >= 2, s"need at least 2 vectors, got ${b.n}")
    val d = b.sum.length
    val c = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = (b.prods(triIdx(i, j, d)) - b.sum(i) * b.sum(j) / b.n) /
          (b.n - 1)
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    c
  }

  /** The covariance pass as an UNCOLLECTED long-format frame
    * (i, j, cov) for i ≤ j < maxDim — the literal production dataflow
    * (same Aggregator, same formula), only formatted, so `q_pca_cov`
    * gates exactly what `fit` consumes (the `q_kmeans_iter_oracle`
    * pattern). maxDim caps the ORACLE side's d² unnest join, not the
    * Spark buffer — the full triangle is aggregated either way. */
  def covarianceDf(vecs: DataFrame, vecCol: String, maxDim: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    momentsFrame(vecs, vecCol)
      .as[CovBuf]
      .flatMap { b =>
        val d = b.sum.length
        for {
          i <- 0 until math.min(d, maxDim)
          j <- i until math.min(d, maxDim)
        } yield (i, j,
          (b.prods(triIdx(i, j, d)) - b.sum(i) * b.sum(j) / b.n) / (b.n - 1))
      }
      .toDF("i", "j", "cov")
  }

  /** Mean-pass buffer: per-dim sums, Σ‖v‖², row count — the O(d)
    * sibling of [[CovBuf]] for the Gram-free path (μ and trace(A)
    * without the d² buffer). */
  final case class MeanBuf(sum: Array[Double], ssq: Double, n: Long)

  /** Elementwise sum + squared-norm accumulation (same null/ragged
    * contract as [[CovStats]]). Input is `Array[Float]`, NOT
    * `Seq[Float]`: the primitive-array encoder deserializes with one
    * bulk `toFloatArray` copy, where the Seq encoder boxes every
    * element — at 3×10⁹ elements per gram-free sweep the boxing, not
    * the arithmetic, was the measured cost. */
  object MeanStats extends Aggregator[Array[Float], MeanBuf, MeanBuf] {
    override def zero: MeanBuf = MeanBuf(Array.empty, 0.0, 0L)
    override def reduce(b: MeanBuf, v: Array[Float]): MeanBuf =
      if (v == null || v.isEmpty) b
      else {
        val b2 = if (b.n == 0L) MeanBuf(new Array[Double](v.length), 0.0, 0L)
          else b
        require(v.length == b2.sum.length,
          s"ragged vectors: ${v.length} vs ${b2.sum.length}")
        var ss = 0.0
        var i = 0
        while (i < v.length) {
          val x = v(i).toDouble
          b2.sum(i) += x
          ss += x * x
          i += 1
        }
        MeanBuf(b2.sum, b2.ssq + ss, b2.n + 1L)
      }
    override def merge(a: MeanBuf, b: MeanBuf): MeanBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sum.length == b.sum.length,
          s"ragged buffers: ${a.sum.length} vs ${b.sum.length}")
        var i = 0
        while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
        MeanBuf(a.sum, a.ssq + b.ssq, a.n + b.n)
      }
    override def finish(b: MeanBuf): MeanBuf = b
    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def toString: String = "graft.Pca.MeanStats"
  }

  /** Gram-free sweep buffer: S = Σ v·(vᵀQ) flattened row-major (d×k
    * doubles — 0.5 MB at d=4096/k=16, 8 MB even at d=65536: the whole
    * point of the path) plus row count. */
  final case class GramBuf(s: Array[Double], n: Long)

  /** One corpus pass of the Gram-free subspace iteration: accumulate
    * S = Σᵥ v (vᵀQ) for a fixed d×k probe Q — the covariance action
    * A·Q follows driver-side from S, μ and n WITHOUT ever forming the
    * d² matrix ([[fitGramFree]]). Per row cost O(d·k); per task state
    * O(d·k). `q` is passed as k COLUMNS of length d. */
  final class GramStats(q: Array[Array[Double]])
      extends Aggregator[Array[Float], GramBuf, GramBuf] with Serializable {
    private val k = q.length
    private val d = q.head.length
    override def zero: GramBuf = GramBuf(Array.empty, 0L)
    override def reduce(b: GramBuf, v: Array[Float]): GramBuf =
      if (v == null || v.isEmpty) b
      else {
        require(v.length == d, s"ragged vectors: ${v.length} vs $d")
        val b2 = if (b.n == 0L) GramBuf(new Array[Double](d * k), 0L) else b
        // primitive float reads, promoted per use — no per-row double
        // copy (26 GB/sweep of allocation churn at n=100k, d=32768)
        val t = new Array[Double](k)
        var j = 0
        var i = 0
        while (j < k) {
          val col = q(j)
          var acc = 0.0
          i = 0
          while (i < d) { acc += v(i) * col(i); i += 1 }
          t(j) = acc
          j += 1
        }
        val s = b2.s
        i = 0
        while (i < d) {
          val xi = v(i).toDouble
          val base = i * k
          j = 0
          while (j < k) { s(base + j) += xi * t(j); j += 1 }
          i += 1
        }
        GramBuf(s, b2.n + 1L)
      }
    override def merge(a: GramBuf, b: GramBuf): GramBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        var i = 0
        while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
        GramBuf(a.s, a.n + b.n)
      }
    override def finish(b: GramBuf): GramBuf = b
    override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    override def toString: String = s"graft.Pca.GramStats(k=$k, d=$d)"
  }

  private def gramPass(vecs: DataFrame, vecCol: String,
      qCols: Array[Array[Double]]): GramBuf = {
    val fn = udaf(new GramStats(qCols))
    val row = vecs.select(col(vecCol).cast("array<float>").as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), _.isNull))
      .agg(fn(col("__v")).as("st"))
      .select(col("st.s").as("s"), col("st.n").as("n"))
      .head()
    GramBuf(row.getSeq[Double](0).toArray, row.getLong(1))
  }

  private[similarity] def collectMean(vecs: DataFrame, vecCol: String): MeanBuf = {
    val fn = udaf(MeanStats)
    val row = vecs.select(col(vecCol).cast("array<float>").as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), _.isNull))
      .agg(fn(col("__v")).as("st"))
      .select(col("st.sum").as("sum"), col("st.ssq").as("ssq"),
        col("st.n").as("n"))
      .head()
    MeanBuf(row.getSeq[Double](0).toArray, row.getDouble(1), row.getLong(2))
  }

  /** The Gram-free power step as an UNCOLLECTED long frame (i, j, s)
    * with s = Σᵥ vᵢ·(vᵀqⱼ) for the engine-neutral md5 ±1 probe — the
    * literal sweep kernel `fitGramFree` runs, formatted for the
    * DuckDB gate exactly as `covarianceDf` gates the moment pass
    * (q_pca_powerstep). `maxDim` caps the ORACLE's output rows, not
    * the Spark buffer. */
  def powerStepDf(vecs: DataFrame, vecCol: String, k: Int, maxDim: Int)
      : DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val d = vecs.select(size(col(vecCol)).as("d"))
      .filter(col("d") > 0).head().getInt(0)
    val qCols = md5SignMatrix(rows = k, dim = d)
    val b = gramPass(vecs, vecCol, qCols)
    (for {
      i <- 0 until math.min(d, maxDim)
      j <- 0 until k
    } yield (i, j, b.s(i * k + j))).toDF("i", "j", "s")
  }

  /** Gram-FREE PCA for dimensions past [[MaxMomentDim]] (or wherever
    * the d²/2 moment buffer is unwelcome): distributed subspace
    * iteration on the covariance ACTION. Per sweep, ONE corpus pass
    * accumulates S = Σ v(vᵀQ) (O(d·k) per task — 8 MB even at d=65536,
    * vs the moment buffer's 34 GB), and the driver forms
    * A·Q = (S − μ·(n·μᵀQ))/(n−1) without materializing A, then
    * re-orthonormalizes; Rayleigh–Ritz every `ritzEvery` sweeps checks
    * the subspace residual ‖AQ − Q(QᵀAQ)‖_F ≤ tol·‖AQ‖_F. The honest
    * trade vs `fit`: sweeps × corpus passes instead of ONE pass + a
    * d³ driver solve — right when d is huge and the top-k spectrum
    * decays (embedding corpora; a flat spectrum converges slowly
    * there as everywhere). Init is the same md5-derived matrix as
    * `topKEigenSubspace` — no RNG, identical basis on every run/host.
    * Exactness seams: the sweep kernel is DuckDB-gated
    * (q_pca_powerstep); the end-to-end fit is spec-pinned against the
    * Jacobi `fit` on a planted spectrum (PcaSpec).
    *
    * Sweep-count guidance (measured, `gramfree_probe_r15.txt`): on a
    * geometric 0.75-decay spectrum at n=100k × d=32768 the residual
    * falls ~1.5 decades per 5 sweeps — 15 sweeps to tol=1e-5, with
    * every recovered eigenvalue already within 1e-5 relative of the
    * exact planted reference; wall is sweeps × one-corpus-pass
    * (159 s/pass there on local[32]) plus a negligible O(d·k²) driver
    * step. Convergence is gap-driven (λ_k/λ_{k+1}); budget
    * maxSweeps ≈ 15–30 for decaying embedding spectra and use
    * `ritzEvery=5` so the stop check itself stays off the hot path.
    * Ops note for the wide-d scan feeding this: Spark's DEFAULT
    * vectorized parquet batch (4096 rows) holds 4096·d·4 B of column
    * vector PER TASK — 0.5 GB at d=32768, an OOM across 32 local
    * threads — set `spark.sql.parquet.columnarReaderBatchSize` so
    * batch·d·4B fits the executor (256 rows at d=32768). */
  def fitGramFree(vecs: DataFrame, vecCol: String, k: Int,
      maxSweeps: Int = 100, tol: Double = 1e-6, ritzEvery: Int = 5,
      verbose: Boolean = false): PcaModel = {
    require(maxSweeps >= 1, s"maxSweeps must be >= 1, got $maxSweeps")
    require(ritzEvery >= 1 && ritzEvery <= maxSweeps,
      s"ritzEvery must be in [1, maxSweeps], got $ritzEvery")
    val mb = collectMean(vecs, vecCol)
    require(mb.n >= 2, s"need at least 2 vectors, got ${mb.n}")
    val d = mb.sum.length
    require(k >= 1 && k <= d, s"k=$k out of range for dim=$d")
    val mean = Array.tabulate(d)(i => mb.sum(i) / mb.n)
    val meanSq = mean.map(x => x * x).sum
    val trace = (mb.ssq - mb.n * meanSq) / (mb.n - 1)
    // columns of Q; md5 init, orthonormalized
    var q = Array.tabulate(k, d) { (j, i) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pca_init_${i}_$j".getBytes("UTF-8"))
      (((h(0) & 0xff) << 8 | (h(1) & 0xff)).toDouble / 65535.0) - 0.5
    }
    require(mgsRows(q), "degenerate md5 init (impossible for d >= k)")
    var sweep = 0
    var done = false
    var vals: Array[Double] = null
    var rows: Array[Array[Double]] = null
    while (sweep < maxSweeps && !done) {
      val g = gramPass(vecs, vecCol, q)
      // AQ columns: aq(j)(i) = (S(i,j) − n·μᵢ·(μᵀqⱼ)) / (n−1)
      val mq = q.map(colj => {
        var acc = 0.0
        var i = 0
        while (i < d) { acc += mean(i) * colj(i); i += 1 }
        acc
      })
      val aq = Array.tabulate(k, d)((j, i) =>
        (g.s(i * k + j) - mb.n * mean(i) * mq(j)) / (mb.n - 1))
      if (sweep % ritzEvery == ritzEvery - 1 || sweep == maxSweeps - 1) {
        // B = QᵀAQ (k×k), symmetrized; residual R = AQ − Q·B
        val b = Array.tabulate(k, k) { (r, c) =>
          var acc = 0.0
          var i = 0
          while (i < d) { acc += q(r)(i) * aq(c)(i); i += 1 }
          acc
        }
        for (r <- 0 until k; c <- r + 1 until k) {
          val m = (b(r)(c) + b(c)(r)) / 2.0; b(r)(c) = m; b(c)(r) = m
        }
        var res = 0.0
        var nrm = 0.0
        for (c <- 0 until k; i <- 0 until d) {
          var qb = 0.0
          var r = 0
          while (r < k) { qb += q(r)(i) * b(r)(c); r += 1 }
          val rr = aq(c)(i) - qb
          res += rr * rr
          nrm += aq(c)(i) * aq(c)(i)
        }
        if (verbose)
          println(f"[fitGramFree] sweep ${sweep + 1}: rel subspace residual " +
            f"${math.sqrt(res / math.max(nrm, Double.MinPositiveValue))}%.3e " +
            f"(tol $tol%.1e)")
        if (res <= tol * tol * math.max(nrm, Double.MinPositiveValue)) {
          val (ev, y) = jacobiEigen(b)
          vals = ev
          rows = y.map { yr =>
            val x = Array.tabulate(d) { i =>
              var acc = 0.0
              var r = 0
              while (r < k) { acc += q(r)(i) * yr(r); r += 1 }
              acc
            }
            var best = 0
            var i = 1
            while (i < d) {
              if (math.abs(x(i)) > math.abs(x(best))) best = i
              i += 1
            }
            if (x(best) < 0.0) { i = 0; while (i < d) { x(i) = -x(i); i += 1 } }
            x
          }
          done = true
        }
      }
      if (!done) {
        q = aq
        require(mgsRows(q),
          "subspace collapsed during iteration (rank-deficient covariance " +
            "with k above its rank?) — fall back to fit() at a lower k")
      }
      sweep += 1
    }
    require(done,
      s"fitGramFree did not converge in $maxSweeps sweeps (tol=$tol) — " +
        "a near-flat top-k spectrum; raise maxSweeps/tol or use fit()")
    PcaModel(mean, rows, vals, mb.n, trace)
  }

  /** Modified Gram–Schmidt over the ROWS of a k×d matrix, in place;
    * false when a row collapses to ~zero. */
  private def mgsRows(m: Array[Array[Double]]): Boolean = {
    val k = m.length
    val d = m.head.length
    var j = 0
    while (j < k) {
      var jj = 0
      while (jj < j) {
        var dp = 0.0
        var i = 0
        while (i < d) { dp += m(j)(i) * m(jj)(i); i += 1 }
        i = 0
        while (i < d) { m(j)(i) -= dp * m(jj)(i); i += 1 }
        jj += 1
      }
      var nrm = 0.0
      var i = 0
      while (i < d) { nrm += m(j)(i) * m(j)(i); i += 1 }
      nrm = math.sqrt(nrm)
      if (nrm < 1e-300) return false
      i = 0
      while (i < d) { m(j)(i) /= nrm; i += 1 }
      j += 1
    }
    true
  }

  /** Trained model: mean, top-k basis ROWS (orthonormal, eigenvalue
    * descending, sign-canonicalized), their eigenvalues, corpus size. */
  final case class PcaModel(mean: Array[Double], basis: Array[Array[Double]],
      eigenvalues: Array[Double], n: Long, totalVariance: Double) {
    def dim: Int = mean.length
    def k: Int = basis.length
    /** Fraction of total variance captured by the k components. */
    def varianceExplained: Double =
      if (totalVariance <= 0) 1.0 else eigenvalues.sum / totalVariance
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix. Returns (eigenvalues, eigenvector ROWS), sorted by
    * eigenvalue DESCENDING (ties by original diagonal index), each
    * vector sign-canonicalized so its largest-|component| entry (first
    * on ties) is positive — two runs, or two hosts, always emit the
    * identical basis. */
  private[similarity] def jacobiEigen(sym: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-12)
      : (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    require(sym.forall(_.length == d), "matrix must be square")
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    // scale-aware stop: off-diagonal energy relative to the matrix norm
    val norm0 = {
      var s = 0.0
      for (i <- 0 until d; j <- 0 until d) s += a(i)(j) * a(i)(j)
      math.max(s, Double.MinPositiveValue)
    }
    var sweep = 0
    while (sweep < maxSweeps && offDiag() > tol * norm0) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // rotate A in the (p,q) plane: A' = JᵀAJ
            var i = 0
            while (i < d) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
                a(i)(q) = s * aip + c * aiq; a(q)(i) = a(i)(q)
              }
              i += 1
            }
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = c * c * app - 2.0 * s * c * apq + s * s * aqq
            a(q)(q) = s * s * app + 2.0 * s * c * apq + c * c * aqq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            // accumulate the rotation into the eigenvector columns
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val rows = order.map { oi =>
      val r = Array.tabulate(d)(i => v(i)(oi))
      // canonical sign: largest-|component| (first on ties) positive
      var best = 0
      var i = 1
      while (i < d) {
        if (math.abs(r(i)) > math.abs(r(best))) best = i
        i += 1
      }
      if (r(best) < 0.0) { i = 0; while (i < d) { r(i) = -r(i); i += 1 } }
      r
    }.toArray
    (vals, rows)
  }

  /** Deterministic subspace iteration + Rayleigh–Ritz for the TOP-k
    * eigenpairs of a symmetric PSD matrix — the k ≪ d fast path
    * (O(d²·k) per sweep vs full Jacobi's O(d³) per sweep; at d=768,
    * k=16 that is milliseconds vs ~30–50 s). Init is a fixed
    * md5-derived matrix (no RNG — two runs, two hosts, same basis),
    * orthonormalized by modified Gram–Schmidt; each sweep multiplies
    * by A and re-orthonormalizes; the Ritz step diagonalizes the k×k
    * projection with the same Jacobi and rotates the basis into
    * eigenvector estimates. Returns None if the residuals haven't
    * converged within maxIter (caller falls back to full Jacobi —
    * correctness never depends on the fast path). */
  private[similarity] def topKEigenSubspace(sym: Array[Array[Double]], k: Int,
      maxIter: Int = 600, tol: Double = 1e-7)
      : Option[(Array[Double], Array[Array[Double]])] = {
    val d = sym.length
    require(k >= 1 && k <= d)
    val normA = math.sqrt(sym.map(_.map(x => x * x).sum).sum)
      .max(Double.MinPositiveValue)
    // Q: d×k, columns orthonormal; md5-hash init, never all-zero
    var q = Array.tabulate(d, k) { (i, j) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pca_init_${i}_$j".getBytes("UTF-8"))
      (((h(0) & 0xff) << 8 | (h(1) & 0xff)).toDouble / 65535.0) - 0.5
    }
    def mgs(m: Array[Array[Double]]): Array[Array[Double]] = {
      // modified Gram–Schmidt over COLUMNS of a d×k matrix, in place
      var j = 0
      while (j < k) {
        var jj = 0
        while (jj < j) {
          var dp = 0.0
          var i = 0
          while (i < d) { dp += m(i)(j) * m(i)(jj); i += 1 }
          i = 0
          while (i < d) { m(i)(j) -= dp * m(i)(jj); i += 1 }
          jj += 1
        }
        var nrm = 0.0
        var i = 0
        while (i < d) { nrm += m(i)(j) * m(i)(j); i += 1 }
        nrm = math.sqrt(nrm)
        if (nrm < 1e-300) return null // degenerate column — bail out
        i = 0
        while (i < d) { m(i)(j) /= nrm; i += 1 }
        j += 1
      }
      m
    }
    def mulA(m: Array[Array[Double]]): Array[Array[Double]] = {
      val out = Array.ofDim[Double](d, k)
      var i = 0
      while (i < d) {
        val row = sym(i)
        var j = 0
        while (j < k) {
          var acc = 0.0
          var c = 0
          while (c < d) { acc += row(c) * m(c)(j); c += 1 }
          out(i)(j) = acc
          j += 1
        }
        i += 1
      }
      out
    }
    if (mgs(q) == null) return None
    var it = 0
    var converged = false
    var ritzVals: Array[Double] = null
    var ritzVecs: Array[Array[Double]] = null // k rows of length d
    // projected-cost guard: power-method convergence is geometric in
    // the eigengap ratio λ_{k+1}/λ_k — on a near-FLAT spectrum
    // (ratio→1) the iteration crawls and would waste more than the
    // Jacobi it replaces (measured: +135 s at d=768 on an isotropic
    // synthetic before this guard). From the per-block residual decay
    // ratio, project the sweeps still needed; if they exceed the
    // remaining budget, bail to Jacobi NOW. The worst-case waste is
    // maxIter cheap O(d²k) sweeps (~2 s at d=768 vs Jacobi's ~50–80 s).
    var lastRes = Double.PositiveInfinity
    while (it < maxIter && !converged) {
      q = mulA(q)
      if (mgs(q) == null) return None
      // Rayleigh–Ritz every sweep is overkill; every 5 sweeps + final
      if (it % 5 == 4 || it == maxIter - 1) {
        val aq = mulA(q)
        val b = Array.tabulate(k, k) { (r, c) =>
          var acc = 0.0
          var i = 0
          while (i < d) { acc += q(i)(r) * aq(i)(c); i += 1 }
          acc
        }
        // symmetrize rounding noise before the k×k Jacobi
        for (r <- 0 until k; c <- r + 1 until k) {
          val m = (b(r)(c) + b(c)(r)) / 2.0; b(r)(c) = m; b(c)(r) = m
        }
        val (vals, yRows) = jacobiEigen(b)
        val xs = yRows.map { y =>
          Array.tabulate(d) { i =>
            var acc = 0.0
            var j = 0
            while (j < k) { acc += q(i)(j) * y(j); j += 1 }
            acc
          }
        }
        // residual ‖A·x − θ·x‖ per Ritz pair, relative to ‖A‖_F
        val maxRes = vals.zip(xs).map { case (th, x) =>
          var res = 0.0
          var i = 0
          while (i < d) {
            var ax = 0.0
            var c = 0
            while (c < d) { ax += sym(i)(c) * x(c); c += 1 }
            val r = ax - th * x(i)
            res += r * r
            i += 1
          }
          math.sqrt(res)
        }.max
        if (maxRes <= tol * normA) {
          converged = true
          ritzVals = vals
          ritzVecs = xs
        } else {
          val rho = maxRes / lastRes // per-5-sweep-block decay
          if (lastRes.isFinite) {
            if (rho >= 0.999) return None // flat spectrum — Jacobi wins
            val blocksNeeded =
              math.log(tol * normA / maxRes) / math.log(rho)
            if (blocksNeeded * 5 > (maxIter - it)) return None
          }
          lastRes = maxRes
        }
      }
      it += 1
    }
    if (!converged) return None
    // canonical sign, same rule as jacobiEigen
    val rows = ritzVecs.map { r0 =>
      val r = r0.clone()
      var best = 0
      var i = 1
      while (i < d) {
        if (math.abs(r(i)) > math.abs(r(best))) best = i
        i += 1
      }
      if (r(best) < 0.0) { i = 0; while (i < d) { r(i) = -r(i); i += 1 } }
      r
    }
    Some((ritzVals, rows))
  }

  /** Train: one distributed moment pass + driver Jacobi. `k` is the
    * output dimensionality (k = dim for a pure rotation, e.g. the
    * PQ-balancing use below).
    *
    * `sampleFraction` < 1 trains on a deterministic md5-coin sample of
    * the corpus (the `ops/Mixture` coin — the same rows on every run
    * and every engine). The moment pass costs O(d²/2) multiplies PER
    * ROW, so at wide embeddings (d ≥ ~512, measured 44 s for 1M×768 vs
    * 3 s for 8M×64 — pca_probe_r13e.txt) a 1–10% sample is the right
    * call: the covariance is an average, its estimate concentrates at
    * O(1/√n), and millions of sampled rows estimate a 768×768 matrix
    * to far beyond quantizer-training accuracy (the `Ivf.build`
    * sampleFraction argument, applied to the statistic instead of the
    * k-means). `idCol` seeds the coin; pass it whenever sampling. */
  def fit(vecs: DataFrame, vecCol: String, k: Int,
      sampleFraction: Double = 1.0, idCol: String = ""): PcaModel = {
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val src =
      if (sampleFraction >= 1.0) vecs
      else {
        require(idCol.nonEmpty, "sampling needs idCol for the md5 coin")
        // round, don't floor (the Cli.scala:841 convention) — flooring
        // biases every fraction down and maps anything below 1/256 to
        // an EMPTY sample that dies later with a misleading dim error
        val nBuckets = math.round(sampleFraction * 256).toInt
        require(nBuckets >= 1,
          s"sampleFraction=$sampleFraction is below the md5-coin " +
            s"resolution (1/256 ≈ ${1.0 / 256})")
        vecs.filter(graft.ops.Mixture.bucket(idCol) < nBuckets)
      }
    val b = collectMoments(src, vecCol)
    val d = b.sum.length
    require(k >= 1 && k <= d, s"k=$k out of range for dim=$d")
    val mean = Array.tabulate(d)(i => b.sum(i) / b.n)
    val cov = covFromMoments(b)
    // total variance = trace — no eigensolve needed for the denominator
    val trace = (0 until d).map(i => cov(i)(i)).sum
    // k ≪ d: subspace iteration is O(d²k) per sweep vs Jacobi's O(d³);
    // at d=768/k=16 that is milliseconds vs ~30–50 s. Jacobi remains
    // the full-rank path and the fallback if iteration doesn't converge
    // (tiny top-gap spectra) — the fast path never costs correctness.
    val (vals, rows) =
      (if (k <= d / 2) topKEigenSubspace(cov, k) else None) match {
        case Some((v, r)) => (v, r)
        case None =>
          val (v, r) = jacobiEigen(cov)
          (v.take(k), r.take(k))
      }
    PcaModel(mean, rows, vals, b.n, trace)
  }

  /** Map-only projection through the fused kernel: (v − mean)·Bᵀ as
    * array<double> of length k. Null/ragged vectors project to null. */
  def project(vec: Column, model: PcaModel): Column =
    matVec(vec, model.basis, model.mean)

  /** Whitening rows: the basis scaled by 1/√λ per component, so
    * `matVec(vec, whitening(m), m.mean)` yields coordinates with
    * (sample-)identity covariance — the Mahalanobis frame. ‖output‖²
    * IS the Mahalanobis distance² to the corpus mean (outlier score);
    * cosine/L2 in this frame de-weights the dominant directions (the
    * standard pre-transform for embedding-similarity calibration).
    * Components with λ ≤ eps pass through unscaled (a degenerate
    * direction carries no signal; dividing by √0 would mint infinities
    * out of rounding noise). */
  def whitening(model: PcaModel, eps: Double = 1e-9): Array[Array[Double]] =
    model.basis.zip(model.eigenvalues).map { case (row, ev) =>
      if (ev <= eps) row.clone()
      else { val s = 1.0 / math.sqrt(ev); row.map(_ * s) }
    }

  /** Raw kernel handle: centered dense mat-vec with an arbitrary
    * matrix (rows = output dims). mean = zeros ⇒ plain projection. */
  def matVec(vec: Column, mat: Array[Array[Double]],
      mean: Array[Double]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      MatVecProject(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec), mat, mean))

  /** Engine-neutral ±1 matrix from md5 hex digits — sign(r,i) = +1
    * iff the first hex char of md5("r_i") has even code point. Both
    * engines derive it from the same digest of the same string, so a
    * JL random projection through the REAL MatVecProject kernel is
    * DuckDB-expressible (`q_jl_project`) — the projection analogue of
    * `Ivf.buildMd5Seeded`'s seeded centroids. */
  def md5SignMatrix(rows: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(rows, dim) { (r, i) =>
      val hex = md.digest(s"${r}_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0).toInt % 2 == 0) 1.0 else -1.0
    }
  }

  /** Persist a trained model as JSON (mean/basis/eigenvalues/n/
    * totalVariance) — the `tokenize --merges_file` pattern: fit once
    * on the big corpus, re-apply to any corpus from the file. */
  def writeModel(m: PcaModel, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      modelMapper.writerWithDefaultPrettyPrinter().writeValueAsString(m))

  def readModel(path: String): PcaModel =
    modelMapper.readValue(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)),
      classOf[PcaModel])

  private lazy val modelMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(
      com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  /** OPQ-style eigenvalue allocation (Ge et al., "Optimized Product
    * Quantization", CVPR 2013 — the non-parametric baseline's
    * balanced-variance variant): deal the eigenvalue-DESCENDING
    * principal dims across m PQ subspaces so each subspace gets
    * dim/m components with near-equal variance PRODUCT (greedy: next
    * dim goes to the non-full subspace with the smallest Σ log λ).
    * Returns the permutation of basis rows — subspace s owns rows
    * perm[s·dsub … (s+1)·dsub). Plain PCA rotation without this piles
    * all the variance into the FIRST subspaces and starves the rest;
    * balanced allocation is what makes PCA-then-PQ beat raw PQ. */
  def balancedOrder(eigenvalues: Array[Double], m: Int): Array[Int] = {
    val d = eigenvalues.length
    require(d % m == 0, s"dim $d not divisible by m $m")
    val dsub = d / m
    val buckets = Array.fill(m)(List.empty[Int])
    val logSum = new Array[Double](m)
    // eigenvalues arrive descending from jacobiEigen; guard anyway
    val order = eigenvalues.indices.sortBy(i => (-eigenvalues(i), i))
    // scale-INVARIANT greedy: accumulate log(λ/geomMean), not log λ.
    // Raw logs compare an empty bucket's 0 against sums whose SIGN
    // depends on the eigenvalue scale — with every λ < 1 (always true
    // for unit-normalized embeddings, trace ≤ 1) bucket 0's negative
    // sum stays "smallest" and the greedy degenerates to the
    // contiguous split this function exists to prevent. Shifting by
    // the mean log makes the comparison invariant to scaling all λ.
    val logs = order.map(i => math.log(math.max(eigenvalues(i), 1e-300)))
    val meanLog = logs.sum / d
    for ((idx, li) <- order.zipWithIndex) {
      var best = -1
      var bestLog = Double.PositiveInfinity
      var s = 0
      while (s < m) {
        if (buckets(s).length < dsub && logSum(s) < bestLog) {
          bestLog = logSum(s); best = s
        }
        s += 1
      }
      buckets(best) ::= idx
      logSum(best) += logs(li) - meanLog
    }
    buckets.flatMap(_.reverse)
  }

  /** The PCA-for-PQ rotation: full-rank basis with rows permuted by
    * [[balancedOrder]] — project with this, then `Pq.build` on the
    * rotated vectors. Distances are preserved exactly (orthonormal
    * rotation), subspace variance is balanced. */
  def pqRotation(model: PcaModel, m: Int): Array[Array[Double]] = {
    require(model.k == model.dim,
      s"need a full-rank model (k=dim), got k=${model.k} dim=${model.dim}")
    balancedOrder(model.eigenvalues, m).map(model.basis)
  }
}
