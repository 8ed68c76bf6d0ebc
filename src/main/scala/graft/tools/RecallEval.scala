package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.{Ivf, IvfPq, Knn, Pq}

/** Recall@k of every approximate ANN route against the exact
  * brute-force cosine top-k, over the driver testdata embeddings —
  * the standard ANN quality metric (recall = |approx ∩ exact| / k
  * averaged over queries), reported per route with its scale knobs so
  * the recall/cost dial is a committed number, not a spec threshold.
  * Usage: tools/run_main.sh graft.tools.RecallEval [sfDir] [k]
  */
object RecallEval {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val cands = e.select("vec_id", "embedding")
    val nQ = 16.0

    def topSet(df: DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (qid, a) => qid -> a.map(_._2).toSet }

    val exact = topSet(Knn.bruteForceTopK(q, cands, k))
    def recall(approx: Map[Long, Set[Long]]): Double =
      exact.map { case (qid, ex) =>
        approx.getOrElse(qid, Set.empty).count(ex).toDouble / ex.size
      }.sum / nQ

    val routes: Seq[(String, () => DataFrame)] = Seq(
      ("lsh planes=8" -> (() => Knn.lshTopK(q, cands, planes = 8, k))),
      ("lsh planes=4" -> (() => Knn.lshTopK(q, cands, planes = 4, k))),
      ("ivf nlist=8 nprobe=2" -> (() => {
        val ix = Ivf.build(e, "vec_id", "embedding", nlist = 8)
        Ivf.search(ix, q, k, nprobe = 2)
      })),
      ("ivf nlist=8 nprobe=4" -> (() => {
        val ix = Ivf.build(e, "vec_id", "embedding", nlist = 8)
        Ivf.search(ix, q, k, nprobe = 4)
      })),
      ("pq m=8 ksub=16" -> (() => {
        val ix = Pq.build(e, "vec_id", "embedding", dim = 64, m = 8, ksub = 16)
        Pq.search(ix.copy(encoded = ix.encoded.localCheckpoint(true)), q, k)
      })),
      ("ivf nlist=8 nprobe=8(=all)" -> (() => {
        val ix = Ivf.build(e, "vec_id", "embedding", nlist = 8)
        Ivf.search(ix, q, k, nprobe = 8)
      })),
      ("pq m=16 ksub=64" -> (() => {
        val ix = Pq.build(e, "vec_id", "embedding", dim = 64, m = 16, ksub = 64)
        Pq.search(ix.copy(encoded = ix.encoded.localCheckpoint(true)), q, k)
      })),
      ("ivfpq RAW nlist=8 nprobe=4 m=8" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 16, residual = false)
        IvfPq.search(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 4)
      })),
      ("ivfpq RESIDUAL nlist=8 nprobe=4 m=8" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 16)
        IvfPq.search(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 4)
      })),
      ("ivfpq RESIDUAL nlist=8 nprobe=4 m=8 ksub=256" -> (() => {
        // the FAISS-default codebook size (8 bits/subquantizer)
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 256)
        IvfPq.search(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 4)
      })),
      ("ivfpq RAW nlist=8 nprobe=8 m=16 ksub=64" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 16, ksub = 64, residual = false)
        IvfPq.search(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 8)
      })),
      ("ivfpq RESIDUAL nlist=8 nprobe=8 m=16 ksub=64" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 16, ksub = 64)
        IvfPq.search(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 8)
      })),
      // ---- the refine dial (round 9, FAISS `refine`): exact-l2
      // re-ranking of the top-R ADC candidates. Two independent caps
      // bound it: the PROBE stage (only candidates in probed lists can
      // be recovered — nprobe=4 of 8 caps at the "ivf nprobe=4" row)
      // and R itself (a true neighbor outside the ADC top-R is lost).
      ("ivfpq RES+refine R=4k nlist=8 nprobe=4 m=8" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 16)
        IvfPq.searchRerank(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 4, rerank = 4)
      })),
      ("ivfpq RES+refine R=8k nlist=8 nprobe=4 m=8" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 16)
        IvfPq.searchRerank(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 4, rerank = 8)
      })),
      ("ivfpq RES+refine R=8k nlist=8 nprobe=8 m=8" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 16)
        IvfPq.searchRerank(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 8, rerank = 8)
      })),
      ("ivfpq RES+refine R=16k nlist=8 nprobe=8 m=8" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 16)
        IvfPq.searchRerank(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 8, rerank = 16)
      })),
      // m=8 at the FAISS-default ksub=256 + refine: the 8-bit codebook
      // tightens ADC containment, the refine converts containment into
      // top-k — the pair is how FAISS ships IVFADC in practice
      // (`IVFx,PQ8` + RefineFlat)
      ("ivfpq RES+refine R=4k nlist=8 nprobe=4 m=8 ksub=256" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 256)
        IvfPq.searchRerank(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 4, rerank = 4)
      })),
      ("ivfpq RES+refine R=8k nlist=8 nprobe=8 m=8 ksub=256" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 256)
        IvfPq.searchRerank(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 8, rerank = 8)
      })),
      ("ivfpq RES+refine R=16k nlist=8 nprobe=8 m=8 ksub=256" -> (() => {
        val ix = IvfPq.build(e, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 256)
        IvfPq.searchRerank(ix.copy(encoded = ix.encoded.localCheckpoint(true)),
          q, k, nprobe = 8, rerank = 16)
      })))
    // the refine re-ranks by EXACT SQUARED L2 (the IVFADC metric);
    // ground truth here is cosine — on a near-uniform corpus the two
    // rankings genuinely differ (all distances nearly equal, so metric
    // noise decides top-k). This row is the METRIC CEILING: brute-force
    // exact-L2 top-k scored against the cosine ground truth — no
    // L2-based route, however exact, can exceed it.
    val l2W = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("l2").asc, col("vec_id"))
    val l2Ceiling = recall(topSet(q.crossJoin(cands)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("l2",
        graft.expressions.GraftExtensions.l2Sq(col("q_vec"), col("embedding")))
      .withColumn("rn", row_number().over(l2W)).filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"))))

    println(s"# recall@$k vs exact cosine, ${exact.size} queries, $dir")
    println(f"# exact-L2 brute force vs cosine truth (metric ceiling) = $l2Ceiling%.3f")
    println("# note: driver embeddings are near-uniform random -- the")
    println("# adversarial case for ANN (no cluster structure to exploit);")
    println("# the point is the monotone recall/cost dial, not absolute values")
    routes.foreach { case (label, run) =>
      val t0 = System.nanoTime()
      val r = recall(topSet(run()))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-44s recall@$k = $r%.3f  (${secs}%.2f s)")
    }

    // ---- filtered ANN (Ivf.searchWhere): recall vs the FILTERED
    // exact top-k. A selective predicate thins every probed list, so
    // at fixed nprobe the candidate pool shrinks and recall drops —
    // the dial a filtered vector query tunes by raising nprobe.
    // Ground truth is brute force over the qualifying vectors only
    // (pre-filter semantics, same as searchWhere's contract).
    def recallVs(exactF: Map[Long, Set[Long]],
        approx: Map[Long, Set[Long]]): Double =
      exactF.map { case (qid, ex) =>
        if (ex.isEmpty) 1.0
        else approx.getOrElse(qid, Set.empty).count(ex).toDouble / ex.size
      }.sum / exactF.size

    // ---- residual (IVFADC) vs raw PQ on a CLUSTERED corpus: the
    // driver embeddings are near-uniform (no structure for the coarse
    // quantizer to strip), so the residual dividend is bounded there;
    // real embedding corpora cluster, and there the residual encoding
    // is the difference between the codebook covering the whole space
    // and covering one list's spread. Deterministic synthetic corpus:
    // 8 well-separated centers in 64-d, sin-jitter offsets.
    {
      import spark.implicits._
      val clustered = (0L until 2000L).map { i =>
        val c = (i % 8).toInt
        (i, Array.tabulate(64) { j =>
          (if (j / 8 == c) 5f else 0f) +
            (math.sin(i * 64 + j) * 0.8).toFloat
        })
      }.toDF("vec_id", "embedding")
      val cq = clustered.filter(col("vec_id") < 16)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val cCands = clustered.select("vec_id", "embedding")
      val cExact = topSet(Knn.bruteForceTopK(cq, cCands, k))
      def crecall(approx: Map[Long, Set[Long]]): Double =
        cExact.map { case (qid, ex) =>
          approx.getOrElse(qid, Set.empty).count(ex).toDouble / ex.size
        }.sum / cExact.size
      for (res <- Seq(false, true)) {
        val ix = IvfPq.build(clustered, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 16, residual = res)
        val r = crecall(topSet(IvfPq.search(
          ix.copy(encoded = ix.encoded.localCheckpoint(true)), cq, k,
          nprobe = 4)))
        val label = if (res) "RESIDUAL" else "RAW"
        println(f"ivfpq $label%-8s clustered-64d nlist=8 nprobe=4 m=8 recall@$k = $r%.3f")
      }
      // the refine on the realistic (clustered) shape: the ADC loss is
      // what the exact re-rank recovers; the probe cap barely binds
      // because clustered queries' true neighbors share their list
      for (rr <- Seq(4, 8)) {
        val ix = IvfPq.build(clustered, "vec_id", "embedding", dim = 64,
          nlist = 8, m = 8, ksub = 16)
        val t0 = System.nanoTime()
        val r = crecall(topSet(IvfPq.searchRerank(
          ix.copy(encoded = ix.encoded.localCheckpoint(true)), cq, k,
          nprobe = 4, rerank = rr)))
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"ivfpq RES+refine R=${rr}k clustered-64d nlist=8 nprobe=4 m=8 " +
          f"recall@$k = $r%.3f  (${secs}%.2f s)")
      }
    }

    val ivfIx = Ivf.build(e, "vec_id", "embedding", nlist = 8)
    val preds = Seq(
      ("sel~10%", graft.ops.Mixture.bucket("vec_id") < 26),
      ("sel~1%", graft.ops.Mixture.bucket("vec_id") < 3))
    for ((plabel, pred) <- preds) {
      val qualifying = cands.filter(pred)
      val nQual = qualifying.count()
      val exactF = topSet(Knn.bruteForceTopK(q, qualifying, k))
      for (nprobe <- Seq(2, 4, 8)) {
        val r = recallVs(exactF,
          topSet(Ivf.searchWhere(ivfIx, q, k, nprobe, pred)
            .select(col("q_id"), col("vec_id"))))
        println(f"ivf filtered $plabel nlist=8 nprobe=$nprobe%-2d " +
          f"(n=$nQual) recall@$k = $r%.3f")
      }
    }
    spark.stop()
  }
}
