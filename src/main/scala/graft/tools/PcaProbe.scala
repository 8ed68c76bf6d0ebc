package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions
import graft.similarity.{Pca, Pq}

/** Scale + quality probe for the PCA layer (`similarity/Pca`).
  *
  * Part A (scale, synthetic n×dims like KmeansProbe): times the ONE
  * distributed moment pass `fit` runs and asserts its executed plan
  * carries exactly one exchange (the partial-buffer merge — the
  * 100 TB claim in Pca's scaladoc), then times the map-only projection
  * pass and asserts it adds NO exchange beyond the scan→agg it feeds.
  *
  * Part B (quality): recall@10 against the exact-L2 ground truth for
  * raw PQ vs PCA-rotated PQ (balancedOrder subspace allocation), and
  * for PCA/JL truncation brute-force routes, on TWO corpora:
  *   - the driver testdata embeddings (near-ISOTROPIC — eigen spread
  *     ~2×, so rotation is expected to be a wash there; reported
  *     honestly rather than cherry-picked), and
  *   - a planted ANISOTROPIC corpus (geometric eigen decay — the
  *     realistic regime: contextual text embeddings are famously
  *     anisotropic, Ethayarajh EMNLP 2019), where balanced rotation
  *     and truncation actually pay.
  *
  * Usage: tools/run_main.sh graft.tools.PcaProbe [sfDir] [nScale] [dims]
  * (defaults /root/testdata/sf0.1, 8,000,000 × 64).
  */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nScale = args.lift(1).map(_.toLong).getOrElse(8000000L)
    val dims = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def tsec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---------------------------------------------------- Part A: scale
    val vecs = spark.range(nScale)
      .select(col("id").as("vec_id"),
        expr(s"""transform(sequence(1, $dims), j ->
          cast(pmod(id * j, 997) / 997.0 + pmod(id + j, 31) / 62.0 AS float))""")
          .as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()

    // the moment pass `fit` collects, via the same Aggregator; plan
    // asserted on the executed (AQE-final) section — KmeansProbe's trick
    val covDf = Pca.covarianceDf(vecs, "embedding", maxDim = 4)
    val (_, tCov) = tsec(covDf.collect())
    val covPlan = covDf.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val covEx = "Exchange ".r.findAllIn(covPlan).size
    println(f"moment pass ($nScale x $dims): $tCov%.2f s " +
      f"(${nScale / tCov / 1e6}%.1f M rows/s), exchanges=$covEx (claim: 1)")
    require(covEx == 1, s"expected ONE exchange in the moment pass:\n$covPlan")

    val (model, tFit) = tsec(Pca.fit(vecs, "embedding", k = 16))
    println(f"fit(k=16) total (pass + driver Jacobi at d=$dims): $tFit%.2f s, " +
      f"varianceExplained=${model.varianceExplained}%.3f")

    // at wide d the O(d²)/row moment pass is the cost center — show the
    // sampled-fit path (the documented wide-d recipe) and how close its
    // basis lands to the full fit
    if (dims >= 256) {
      val (ms, tS) = tsec(
        Pca.fit(vecs, "embedding", k = 16, sampleFraction = 0.05,
          idCol = "vec_id"))
      val cosTop = math.abs(
        ms.basis.head.zip(model.basis.head).map { case (a, b) => a * b }.sum)
      println(f"fit(k=16, md5 sample ~5%%): $tS%.2f s, " +
        f"varianceExplained=${ms.varianceExplained}%.3f, " +
        f"top-eigvec |cos| vs full fit $cosTop%.4f")
    }

    // projection pass: map-only — the ONLY exchange in scan→project→sum
    // is the 1-row sum merge
    val projDf = vecs
      .select(element_at(Pca.project(col("embedding"), model), 1).as("p"))
      .agg(sum("p"))
    val (_, tProj) = tsec(projDf.collect())
    val projPlan = projDf.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val projEx = "Exchange ".r.findAllIn(projPlan).size
    println(f"projection pass (k=16): $tProj%.2f s " +
      f"(${nScale / tProj / 1e6}%.1f M rows/s), exchanges=$projEx " +
      "(claim: 1 — the scalar sum merge; projection itself map-only)")
    require(projEx == 1, s"projection must add no exchange:\n$projPlan")
    vecs.unpersist()

    // -------------------------------------------------- Part B: quality
    def l2TopK(queries: DataFrame, cands: DataFrame, k: Int): DataFrame = {
      val scored = cands.join(broadcast(queries), col("q_id") =!= col("vec_id"))
        .withColumn("d", GraftExtensions.l2Sq(col("q_vec"), col("embedding")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("d").asc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("q_id", "vec_id")
    }
    def topSet(df: DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

    def evalCorpus(tag: String, corpus: DataFrame): Unit = {
      val e = corpus.persist()
      // the corpus's own width (the testdata stays 64-d even when the
      // scale half runs at a wider synthetic dims)
      val d = e.select(size(col("embedding")).as("d"))
        .filter(col("d") > 0).head().getInt(0)
      val q = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val exact = topSet(l2TopK(q, e, 10))
      def recall(approx: Map[Long, Set[Long]]): Double =
        exact.map { case (qid, ex) =>
          approx.getOrElse(qid, Set.empty).count(ex).toDouble / ex.size
        }.sum / exact.size

      val full = Pca.fit(e, "embedding", k = d)
      println(f"[$tag] eigen top=${full.eigenvalues.head}%.4f " +
        f"median=${full.eigenvalues(d / 2)}%.4f " +
        f"min=${full.eigenvalues.last}%.4f; varExplained k=16 " +
        f"${full.eigenvalues.take(16).sum / full.totalVariance}%.3f, k=32 " +
        f"${full.eigenvalues.take(32).sum / full.totalVariance}%.3f")

      // raw PQ vs rotated PQ, same knobs (m=8, ksub=16)
      val rawIx = Pq.build(e, "vec_id", "embedding", d, m = 8, ksub = 16)
      val rRaw = recall(topSet(
        Pq.search(rawIx.copy(encoded = rawIx.encoded.localCheckpoint(true)),
          q, 10).select("q_id", "vec_id")))

      val rot = Pca.pqRotation(full, m = 8)
      def rotate(df: DataFrame, vc: String): DataFrame =
        df.withColumn(vc, Pca.matVec(col(vc), rot, full.mean)
          .cast("array<float>"))
      val eRot = rotate(e, "embedding")
      val qRot = rotate(q, "q_vec")
      val rotIx = Pq.build(eRot, "vec_id", "embedding", d, m = 8, ksub = 16)
      val rRot = recall(topSet(
        Pq.search(rotIx.copy(encoded = rotIx.encoded.localCheckpoint(true)),
          qRot, 10).select("q_id", "vec_id")))
      println(f"[$tag] PQ m=8 ksub=16 recall@10: raw $rRaw%.3f -> " +
        f"PCA-rotated (balancedOrder) $rRot%.3f")

      // truncation routes: brute-force L2 in the reduced space
      for (kk <- Seq(32, 16)) {
        val mk = Pca.PcaModel(full.mean, full.basis.take(kk),
          full.eigenvalues.take(kk), full.n, full.totalVariance)
        def reduce(df: DataFrame, vc: String): DataFrame =
          df.withColumn(vc, Pca.project(col(vc), mk).cast("array<float>"))
        val r = recall(topSet(l2TopK(reduce(q, "q_vec"),
          reduce(e, "embedding"), 10)))
        println(f"[$tag] PCA truncate k=$kk brute-force recall@10: $r%.3f " +
          f"(${kk * 100 / d}%% of dims)")
      }
      val jl = Pca.md5SignMatrix(32, d)
      def jlReduce(df: DataFrame, vc: String): DataFrame =
        df.withColumn(vc, Pca.matVec(col(vc), jl, new Array[Double](d))
          .cast("array<float>"))
      val rJl = recall(topSet(l2TopK(jlReduce(q, "q_vec"),
        jlReduce(e, "embedding"), 10)))
      println(f"[$tag] JL +-1 k=32 brute-force recall@10: $rJl%.3f")
      e.unpersist()
    }

    // testdata corpus (near-isotropic)
    evalCorpus("testdata",
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding").filter(col("embedding").isNotNull))

    // planted anisotropic corpus: rank-64 mixture with geometric scale
    // decay 0.88^r over fixed quasi-orthogonal directions + small noise
    val rank = dims
    val dirs: Array[Array[Double]] = Array.tabulate(rank)(r => {
      // hash-mixed deterministic directions — a single-frequency
      // sin(θr + cj) family would span only 2 dimensions across r
      val raw = Array.tabulate(dims) { j =>
        val h = r * 1315423911L ^ (j + 7) * 2654435761L
        (java.lang.Long.rotateLeft(h * 0x9E3779B97F4A7C15L, 31) % 10007) / 10007.0
      }
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    })
    val aniso = (0 until 20000).map { i =>
      val v = new Array[Double](dims)
      for (r <- 0 until rank) {
        val scale = 6.0 * math.pow(0.88, r)
        // per-direction frequency — same-frequency sinusoids would
        // collapse every coefficient into span{sin(wi), cos(wi)} and
        // make the corpus effectively rank 2
        val t = scale * math.sin(i * (0.31 + 0.037 * r) + 1.3 * r)
        for (j <- 0 until dims) v(j) += t * dirs(r)(j)
      }
      (i.toLong, v.map(x => (x + 0.01 * math.sin(i * dims + x)).toFloat))
    }.toDF("vec_id", "embedding").repartition(32)
    evalCorpus("anisotropic", aniso)

    spark.stop()
  }
}
