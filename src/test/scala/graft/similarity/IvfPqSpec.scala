package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {

  // four well-separated clusters in 16-d
  private lazy val vecs = {
    import spark.implicits._
    (0L until 120L).map { i =>
      val c = (i % 4).toInt
      val base = Array.tabulate(16)(j => if (j / 4 == c) 6f else 0f)
      (i, base.zipWithIndex.map { case (x, j) =>
        x + (math.sin(i * 16 + j) * 0.3).toFloat })
    }.toDF("vec_id", "embedding")
  }

  // default build = residual (IVFADC); raw kept for the PQ-equivalence
  // and A/B assertions below
  private lazy val index = IvfPq.build(vecs, "vec_id", "embedding",
    dim = 16, nlist = 4, m = 4, ksub = 8)
  private lazy val rawIndex = IvfPq.build(vecs, "vec_id", "embedding",
    dim = 16, nlist = 4, m = 4, ksub = 8, residual = false)

  test("build assigns a list and codes to every vector") {
    assert(index.residual)
    assert(index.encoded.count() == 120)
    val row = index.encoded.select("list_id", "codes").head()
    assert(row.getInt(0) >= 0 && row.getInt(0) < 4)
    assert(row.getSeq[Int](1).length == 4)
    // the residual column is internal — not leaked into the index
    assert(!index.encoded.columns.contains("__resid"))
  }

  test("raw (non-residual) search with nprobe=nlist matches full-PQ search") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val ivfpq = IvfPq.search(rawIndex, q, k = 5, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqIndex = Pq.PqIndex(rawIndex.codebooks, rawIndex.dsub,
      rawIndex.encoded, "vec_id", "embedding")
    val full = Pq.search(pqIndex, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq == full)
  }

  test("residual ADC approximates true squared L2 better than raw ADC") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // true squared L2 distances for every (query, candidate) pair
    val truth = q.crossJoin(vecs.filter(col("vec_id") >= 8))
      .select(col("q_id"), col("vec_id"),
        graft.expressions.GraftExtensions.l2Sq(col("q_vec"), col("embedding"))
          .as("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def meanAdcErr(ix: IvfPq.IvfPqIndex): Double = {
      val rows = IvfPq.search(ix, q, k = 112, nprobe = 4).collect()
        .filter(r => truth.contains((r.getLong(0), r.getLong(1))))
      rows.map(r => math.abs(r.getDouble(2) -
        truth((r.getLong(0), r.getLong(1))))).sum / rows.length
    }
    val errRes = meanAdcErr(index)
    val errRaw = meanAdcErr(rawIndex)
    // same m/ksub budget: encoding residuals (IVFADC) must cut the
    // quantization error materially on clustered data
    assert(errRes < errRaw * 0.5,
      f"residual err $errRes%.4f not < half of raw err $errRaw%.4f")
  }

  test("buildResidualMd5Seeded: deterministic, residual-flagged, k results per query") {
    import spark.implicits._
    val ix = IvfPq.buildResidualMd5Seeded(vecs, "vec_id", "embedding",
      dim = 16, nlist = 4, m = 4, ksub = 8)
    assert(ix.residual)
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def run() = IvfPq.search(ix, q, k = 5, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val a = run(); val b = run()
    assert(a == b)
    assert(a.groupBy(_._1).forall(_._2.size == 5))
  }

  test("writeIndex → readIndex → search: codes-only layout, partition-pruned, same results") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    IvfPq.writeIndex(index, dir)
    val reopened = IvfPq.readIndex(spark, dir, index.centroids,
      index.codebooks, index.dsub, "vec_id", "embedding")
    // the raw vector column is NOT stored — codes are the index payload
    assert(reopened.encoded.columns.toSet == Set("vec_id", "codes", "list_id"))
    val q = vecs.filter(col("vec_id") === 1)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val onDisk = IvfPq.search(reopened, q, k = 5, nprobe = 1)
    // the at-rest layout is one directory per coarse list (what a
    // probe's list_id filter prunes; pruning mechanics are asserted on
    // the static-filter path in IvfSpec)
    val listDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list_id="))
    assert(listDirs.length == 4, listDirs.mkString(","))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(key(onDisk) == key(IvfPq.search(index, q, k = 5, nprobe = 1)))
  }

  test("searchRerank on a materialized index: explicit corpus hydrates; omitting it fails fast") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_rr").toString
    IvfPq.writeIndex(index, dir)
    val reopened = IvfPq.readIndex(spark, dir, index.centroids,
      index.codebooks, index.dsub, "vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // the at-rest layout drops raw vectors by design — re-ranking a
    // readIndex index must take the corpus explicitly, and the result
    // must match the fresh-index route exactly
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val onDisk = IvfPq.searchRerank(reopened, q, k = 5, nprobe = 4,
      rerank = 4, corpus = Some(vecs))
    val fresh = IvfPq.searchRerank(index, q, k = 5, nprobe = 4, rerank = 4)
    assert(key(onDisk) == key(fresh))
    // without the corpus there is nothing to hydrate from: fail fast
    // with the explanatory message, not an unresolved-column error
    val e = intercept[IllegalArgumentException] {
      IvfPq.searchRerank(reopened, q, k = 5, nprobe = 4, rerank = 4)
    }
    assert(e.getMessage.contains("readIndex"), e.getMessage)
  }

  test("searchRerank: exact re-ranking of the ADC pool — true-L2 ordered, never worse") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val refined = IvfPq.searchRerank(index, q, k = 5, nprobe = 4, rerank = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // k results per query, self excluded
    val byQ = refined.groupBy(_._1)
    assert(byQ.size == 8 && byQ.values.forall(_.length == 5))
    assert(refined.forall { case (qid, vid, _) => qid != vid })
    // the reported score IS the true squared L2 (not ADC): recompute
    // driver-side from the raw vectors
    val raw = vecs.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).toArray).toMap
    refined.foreach { case (qid, vid, ex) =>
      val (a, b) = (raw(qid), raw(vid))
      val want = a.indices.map { j =>
        val d = a(j).toDouble - b(j).toDouble; d * d }.sum
      assert(math.abs(ex - want) < 1e-9, s"($qid,$vid): $ex vs $want")
    }
    // recall vs the exact L2 top-5 (within probed lists = all lists at
    // nprobe=4): refine must do at least as well as the plain ADC top-5
    def topSet(rows: Array[(Long, Long)]): Map[Long, Set[Long]] =
      rows.groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val exact = topSet(q.crossJoin(vecs.select(col("vec_id"), col("embedding")))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("l2", graft.expressions.GraftExtensions.l2Sq(
        col("q_vec"), col("embedding")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("l2").asc, col("vec_id"))))
      .filter(col("rn") <= 5).select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))))
    val adcSet = topSet(IvfPq.search(index, q, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))))
    val refSet = topSet(refined.map(t => (t._1, t._2)))
    def hits(m: Map[Long, Set[Long]]): Int =
      exact.map { case (k2, ex) => m.getOrElse(k2, Set.empty).count(ex) }.sum
    assert(hits(refSet) >= hits(adcSet),
      s"refine degraded recall: ${hits(refSet)} < ${hits(adcSet)}")
    // on this clustered fixture the refined top-5 IS the exact top-5
    assert(refSet == exact)
  }

  test("build's n matches the ENCODED corpus when the input carries null / mis-sized vectors (r12 ADVICE)") {
    import spark.implicits._
    // 120 good vectors + 2 nulls: the encode path (Pq.build's
    // isNotNull && size==dim filter) drops the null rows, so the
    // persisted n must be 120 — not 122, which would diverge from
    // readIndex's encoded.count() fallback for hand-built indexes.
    // (Mis-SIZED vectors are out of scope here: they fail k-means
    // training itself, so a corpus carrying them never builds.)
    val dirty = vecs.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .unionByName(Seq(
        (900L, null.asInstanceOf[Array[Float]]),
        (901L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding"))
    val ix = IvfPq.build(dirty, "vec_id", "embedding",
      dim = 16, nlist = 4, m = 4, ksub = 8)
    assert(ix.encoded.count() == 120)
    assert(ix.n == 120, s"n must match the encoded corpus, got ${ix.n}")
  }

  test("corpus size n travels with the index: build sets it, the writeIndex sidecar persists it, and the rerank default runs NO job to learn it") {
    import spark.implicits._
    // build captures n once
    assert(index.n == 120, s"build must record the corpus size, got ${index.n}")
    // writeIndex persists it; readIndex restores it without a count job
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_n").toString
    IvfPq.writeIndex(index, dir)
    assert(new java.io.File(dir, "_graft_ivfpq.json").isFile)
    val reopened = IvfPq.readIndex(spark, dir, index.centroids,
      index.codebooks, index.dsub, "vec_id", "embedding")
    assert(reopened.n == 120)
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // the scale-aware default must SIZE R from the carried n — not run
    // a Spark job over the encoded table per search call (the r11
    // ADVICE finding: a count() per call, or a full re-encode of an
    // unmaterialized index). Building the search frame is pure plan
    // construction: zero jobs.
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val planned = IvfPq.searchRerank(reopened, q, k = 5, nprobe = 4,
        corpus = Some(vecs))
      Thread.sleep(500) // listener bus is async; any count job is long done
      assert(jobs.get() == 0,
        s"searchRerank default ran ${jobs.get()} job(s) while planning")
      // and the planned frame is the real thing — same rows as the
      // fresh-index default route
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(key(planned) == key(
        IvfPq.searchRerank(index, q, k = 5, nprobe = 4)))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("search with nprobe=1 stays inside the query's cluster") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") === 1) // cluster 1
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val hits = IvfPq.search(index, q, k = 5, nprobe = 1).collect()
      .map(_.getLong(1))
    assert(hits.length == 5)
    assert(hits.forall(_ % 4 == 1), s"left the cluster: ${hits.mkString(",")}")
  }

  test("autoRefinePool: the scale-aware default R (round-10 recall-collapse finding)") {
    import IvfPq.autoRefinePool
    // small-corpus floor = FAISS-practice k_factor 4
    assert(autoRefinePool(5, 100, 8, 2) == 20)
    // the sf0.01 oracle op point (k=5, n=500, nlist=8, nprobe=2): the
    // integer ceil-div the q_ann_ivfpq_rerank_oracle SQL reproduces —
    // GREATEST(20, (500*2 + 47) // 48) = 21
    assert(autoRefinePool(5, 500, 8, 2) == 21)
    // the r10 probe op point (kFetch=94, n=168k, nlist=8, nprobe=4):
    // one sixth of the 84k scanned pool = 14000, ABOVE the measured
    // restore point (R=12,784 → recall 0.819 vs 0.913 exact-L2
    // ceiling, bm25_recall_r10.txt) where the old fixed default
    // (4·k = 376) sat in the 0.250-collapse regime
    assert(autoRefinePool(94, 168000, 8, 4) == 14000)
    assert(autoRefinePool(94, 168000, 8, 4) > 12784)
    // R tracks the corpus linearly once past the floor — the
    // held-R-under-84x-growth collapse cannot recur by default
    assert(autoRefinePool(10, 2000, 8, 4) == 167)
    assert(autoRefinePool(10, 168000, 8, 4) == 14000)
  }

  test("searchRerank default equals explicit k_factor 4 where the floor dominates") {
    import spark.implicits._
    // n=120, nlist=4, nprobe=4, k=5: scaled pool = ceil(480/24) = 20 =
    // the 4·k floor, so the default route must be result-identical to
    // the old explicit rerank=4 — the small-corpus behavior is
    // unchanged by the scale-aware default
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(IvfPq.searchRerank(index, q, k = 5, nprobe = 4)) ==
      key(IvfPq.searchRerank(index, q, k = 5, nprobe = 4, rerank = 4)))
  }

  test("default refine pool holds recall near exact-L2 where a fixed small R collapses (near-uniform corpus)") {
    import spark.implicits._
    // miniature of the r10 family-excluded regime: near-uniform
    // vectors make ADC ordering loose, so the true top-k scatters
    // through a deep ADC prefix — exactly where a fixed cutoff
    // truncates it. nprobe = nlist isolates the cutoff effect (no
    // probe misses).
    val n = 2400
    val uni = (0L until n.toLong).map { i =>
      (i, Array.tabulate(16)(j => (math.sin(i * 37.0 + j * 131.0) * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val ix = IvfPq.build(uni, "vec_id", "embedding", dim = 16,
      nlist = 8, m = 4, ksub = 8)
    val frozen = ix.copy(encoded = ix.encoded.localCheckpoint(true))
    val q = uni.filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // exact-L2 truth (self excluded, searchRerank's own tie order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d2").asc, col("vec_id"))
    val truth = q.crossJoin(uni).filter(col("q_id") =!= col("vec_id"))
      .withColumn("d2", graft.expressions.GraftExtensions.l2Sq(
        col("q_vec"), col("embedding")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 10).select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (qid, t) =>
        got.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }
    val fixed = recallOf(
      IvfPq.searchRerank(frozen, q, k = 10, nprobe = 8, rerank = 2))
    val auto = recallOf(IvfPq.searchRerank(frozen, q, k = 10, nprobe = 8))
    // default pool = ceil(2400·8/48) = 400 ≫ the fixed 20: recall must
    // sit within 0.1 of the exact ceiling (1.0 here — all lists
    // probed) and strictly above the truncated pool's
    assert(auto >= 0.9, s"auto-R recall $auto")
    assert(auto > fixed, s"auto $auto vs fixed-R $fixed")
  }
}
