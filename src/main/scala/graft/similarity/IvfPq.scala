package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** IVF-PQ: inverted-file pruning composed with product-quantized
  * scoring — the canonical billion-scale ANN layout (FAISS `IVFx,PQy`).
  *
  * IVF contributes the SCAN reduction (probe `nprobe` of `nlist`
  * partitions instead of the corpus) and PQ the MEMORY reduction
  * (m small codes per vector instead of d floats), so the index both
  * prunes and fits at 100 TB: at rest the encoded table partitions by
  * `list_id` (`.write.partitionBy`), a probe reads only the lists it
  * needs (partition pruning), and each candidate costs m table lookups.
  *
  * RESIDUAL encoding (FAISS IVFADC, Jégou et al. 2011 §IV): what gets
  * PQ-encoded is `r = v − c_list(v)`, the vector's offset from its
  * coarse centroid, not `v` itself. The coarse step already explains
  * the between-list variance, so the residual distribution each
  * codebook has to cover is tighter than the raw corpus — the same
  * m×ksub budget buys materially finer cells (recall_r8_sf01.txt:
  * recall@10 0.163 → see artifact at nlist=8/nprobe=4/m=8). The cost
  * is one ADC table per (query, probed list) instead of per query —
  * still |Q|·nprobe tiny arrays, broadcast like before. `build`
  * defaults to residual; `residual = false` keeps the raw-vector
  * variant (the r7 behavior) for comparison.
  */
object IvfPq {

  final case class IvfPqIndex(
      centroids: Seq[(Int, Array[Float])],
      codebooks: Array[Array[Array[Float]]],
      dsub: Int,
      /** input columns + list_id + codes */
      encoded: DataFrame,
      idCol: String,
      vecCol: String,
      /** codes encode `v − c_list` (IVFADC) rather than `v` */
      residual: Boolean = false,
      /** corpus size, captured at build time and persisted in the
        * `writeIndex` sidecar — the statistic the scale-aware rerank
        * default ([[autoRefinePool]]) sizes R from. −1 = unknown (a
        * hand-assembled index), in which case `searchRerank` falls
        * back to counting `encoded` once. Carrying it here means the
        * default NEVER runs a Spark job per search call — and never
        * forces a full re-encode of an un-materialized index just to
        * learn n (the r11 ADVICE finding). */
      n: Long = -1L)

  /** `v − c_{list}` in DOUBLE: both sides promote exactly from float32,
    * and the subtraction is one IEEE double op — so an external engine
    * (the DuckDB oracle) reproduces the residual bit-for-bit. The
    * zip_with evaluates interpreted, but once per row into its own
    * projection (CollapseProject keeps non-cheap aliases separate), and
    * the m×ksub argmin that CONSUMES it stays codegen'd. */
  private[similarity] def residualExpr(vec: Column, listId: Column,
      centroids: Seq[(Int, Array[Float])]): Column = {
    val matrix = centroids.sortBy(_._1).map(_._2.map(_.toDouble).toSeq)
    zip_with(vec.cast("array<double>"),
      element_at(typedLit(matrix), listId.cast("int") + 1),
      (a, b) => a - b)
  }

  /** Coarse-quantize into `nlist` lists (driver-trained k-means,
    * distributed codegen'd assignment — `Ivf.build`) and PQ-encode
    * every vector's residual (`Pq.build` over `v − c_list`). One pass
    * over the corpus, no shuffle. */
  def build(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      nlist: Int, m: Int, ksub: Int, seed: Long = 42L,
      sampleFraction: Double = 1.0, maxIter: Int = 10,
      trainCap: Int = 16384, residual: Boolean = true): IvfPqIndex = {
    val ivf = Ivf.build(vecs, idCol, vecCol, nlist, seed, sampleFraction,
      maxIter, trainCap)
    // corpus size, captured ONCE at build: the scale-aware rerank
    // default consumes it instead of running a job per search. Counted
    // under the SAME (non-null, dim-length) filter Pq.build applies to
    // what it encodes, so the persisted n matches `encoded.count()` —
    // readIndex's fallback for hand-assembled indexes — instead of
    // exceeding it whenever the input carries null/mis-sized vectors
    // (the r12 ADVICE finding). NOT observed on the training pass: an
    // Observation below a global sort double-counts (the range
    // partitioner's boundary-sampling pass re-executes the subtree —
    // measured exactly 2×).
    val n = vecs.filter(col(vecCol).isNotNull
      && size(col(vecCol).cast("array<float>")) === dim).count()
    if (!residual) {
      val pq = Pq.build(ivf.assigned, idCol, vecCol, dim, m, ksub, seed,
        maxIter, trainCap)
      IvfPqIndex(ivf.centroids, pq.codebooks, pq.dsub, pq.encoded,
        idCol, vecCol, residual = false, n = n)
    } else {
      val withRes = ivf.assigned.withColumn("__resid",
        residualExpr(col(vecCol), col("list_id"), ivf.centroids))
      val pq = Pq.build(withRes, idCol, "__resid", dim, m, ksub, seed,
        maxIter, trainCap)
      IvfPqIndex(ivf.centroids, pq.codebooks, pq.dsub,
        pq.encoded.drop("__resid"), idCol, vecCol, residual = true, n = n)
    }
  }

  /** Engine-neutral deterministic RESIDUAL build for oracle gating —
    * the IVFADC sibling of `Ivf.buildMd5Seeded`/`Pq.buildMd5Seeded`:
    * coarse centroids are the first `nlist` md5-ranked corpus vectors,
    * the PQ codebook of every subspace is the sub-slice of the first
    * `ksub` md5-ranked vectors' RESIDUALS (float-rounded exactly as
    * the trained path stores them), and every non-training stage —
    * `Ivf.assign`, `residualExpr`, `Pq.encodeExpr`, the per-(q,list)
    * distance tables, `Pq.adcExpr`, `Pq.topK` — is the identical code
    * path `build`+`search` run. Gated by q_ann_ivfpq_res_oracle. */
  def buildResidualMd5Seeded(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, nlist: Int, m: Int, ksub: Int): IvfPqIndex = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val ivf = Ivf.buildMd5Seeded(vecs, idCol, vecCol, nlist)
    val seedRows = ivf.assigned
      .select(col(idCol), col(vecCol).cast("array<float>").as("__v"),
        col("list_id"))
      .filter(col("__v").isNotNull && size(col("__v")) === dim)
      .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(ksub)
      .collect()
    require(seedRows.length >= ksub, s"need at least $ksub seed vectors")
    val centMap = ivf.centroids.toMap
    val seedRes: Array[Array[Float]] = seedRows.map { r =>
      val v = r.getSeq[Float](1).toArray
      val c = centMap(r.getInt(2))
      // double-exact residual, float-rounded for storage — the same
      // representation the trained build's codebooks live in
      Array.tabulate(dim)(j => (v(j).toDouble - c(j).toDouble).toFloat)
    }
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { s =>
      seedRes.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
    }
    val encoded = ivf.assigned
      .withColumn("__resid",
        residualExpr(col(vecCol), col("list_id"), ivf.centroids))
      .withColumn("codes", Pq.encodeExpr(col("__resid"), codebooks, dsub))
      .drop("__resid")
    // same (non-null, dim-length) filter as the trained build above, so
    // the persisted n matches the encoded corpus on dirty inputs too
    val n = vecs.filter(col(vecCol).isNotNull
      && size(col(vecCol).cast("array<float>")) === dim).count()
    IvfPqIndex(ivf.centroids, codebooks, dsub, encoded, idCol, vecCol,
      residual = true, n = n)
  }

  /** Materialize at rest: the PQ-encoded table partitioned by coarse
    * list — codes are the only payload that has to travel at search
    * time, and a probe's `list_id` choice prunes whole directories
    * (same layout story as `Ivf.writeIndex`, with PQ's ~d·4/m
    * compression on top). The wide raw-vector column is dropped: the
    * index is codes + id, the corpus stays the source of truth. */
  /** Stats sidecar riding the materialized layout (underscore-prefixed
    * so parquet readers skip it): carries the build-time corpus size,
    * the statistic the scale-aware rerank default needs — a search
    * must not pay a count job (or worse, a full re-encode of an
    * un-materialized index) to learn n. */
  private val StatsSidecar = "_graft_ivfpq.json"

  def writeIndex(index: IvfPqIndex, path: String): Unit = {
    index.encoded.select(col(index.idCol), col("codes"), col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(path)
    // sidecar through the HADOOP filesystem, not java.io: the parquet
    // write above accepts hdfs://-style paths, and the sidecar must land
    // on the same filesystem (a local-File write would throw — or
    // worse, write somewhere local — for any distributed path)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val payload = new java.util.LinkedHashMap[String, Any]()
    payload.put("n", java.lang.Long.valueOf(index.n))
    val p = new org.apache.hadoop.fs.Path(path, StatsSidecar)
    val fs = p.getFileSystem(
      index.encoded.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsString(payload)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Re-open a materialized index (centroids + codebooks are the
    * driver-sized artifacts persisted alongside). The corpus size
    * comes back from the stats sidecar; a pre-sidecar layout counts
    * the (already materialized, codes-only) parquet ONCE here — never
    * per search. */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: Seq[(Int, Array[Float])],
      codebooks: Array[Array[Array[Float]]], dsub: Int, idCol: String,
      vecCol: String, residual: Boolean = true): IvfPqIndex = {
    val encoded = spark.read.parquet(path)
    val p = new org.apache.hadoop.fs.Path(path, StatsSidecar)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val n =
      if (fs.exists(p)) {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        // FSDataInputStream is both DataInput and InputStream — pin
        // the jackson overload
        val in: java.io.InputStream = fs.open(p)
        try mapper.readValue(in, classOf[java.util.Map[String, Any]])
          .get("n").toString.toLong
        finally in.close()
      } else encoded.count()
    IvfPqIndex(centroids, codebooks, dsub, encoded, idCol, vecCol,
      residual, n = n)
  }

  /** Top-k per query: rank centroids (broadcast), keep `nprobe` lists,
    * ADC-score only candidates in those lists. Returns
    * (q_id, idCol, adc) — smaller adc = closer (squared L2 to the
    * query — in residual mode to the query's residual against each
    * probed list, the IVFADC distance — as approximated by the
    * codebooks). */
  def search(index: IvfPqIndex, queries: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.toDF("list_id", "centroid")
    // nearest lists per query by true L2 to the coarse centroids
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cdist").asc, col("list_id"))
    val probePairs = queries.crossJoin(broadcast(cents))
      .withColumn("cdist", GraftExtensions.l2Sq(col("q_vec"), col("centroid")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("list_id"))
    val probes =
      if (index.residual) {
        // IVFADC: one distance table per (query, probed list) — the
        // table is against the QUERY'S RESIDUAL to that list's
        // centroid, so candidates in list l are scored in l's residual
        // frame. Still |Q|·nprobe rows of m×ksub doubles, broadcast.
        probePairs
          .withColumn("__qres",
            residualExpr(col("q_vec"), col("list_id"), index.centroids))
          .select(col("q_id"), col("list_id"),
            Pq.dtableExpr(index.codebooks, index.dsub, col("__qres"))
              .as("__dt"))
      } else {
        // raw encoding: ADC table computed ONCE per query, joined onto
        // the (q_id, list_id) probe pairs
        val dt = broadcast(queries.select(col("q_id"),
          Pq.dtableExpr(index.codebooks, index.dsub, col("q_vec")).as("__dt")))
        probePairs.select(col("q_id"), col("list_id")).join(dt, Seq("q_id"))
      }
    val scored = index.encoded
      .select(col(index.idCol), col("list_id"), col("codes"))
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col(index.idCol))
      .withColumn("adc", Pq.adcExpr(col("codes"), col("__dt"), index.codebooks.length))
    Pq.topK(scored, index.idCol, k)
  }

  /** FAISS `refine` on the IVFADC route: exact-distance re-ranking of
    * the top-`rerank`·k ADC candidates. ADC is a lossy m-byte
    * approximation — its top-k misses true neighbors whose codes
    * collide; re-scoring a SMALL candidate pool (R = rerank·k per
    * query) with the true squared L2 against the raw vectors recovers
    * most of them at a cost independent of corpus size:
    *
    *  - the ADC stage is unchanged (`search` at k·rerank) — the scan
    *    still reads only probed lists, codes only;
    *  - the candidate set (|Q|·R rows of (q_id, id)) is BROADCAST onto
    *    the corpus, so hydrating raw vectors is one map-side semi-join
    *    scan of the id+vector columns — no shuffle of the corpus, and
    *    at rest the corpus read prunes to those columns;
    *  - the exact distance is the codegen'd double fold
    *    (`GraftExtensions.l2Sq`, float→double promotion exact), so an
    *    external engine reproduces it bit-for-bit — the composed route
    *    is oracle-gated end to end (q_ann_ivfpq_rerank_oracle).
    *
    * Returns (q_id, idCol, exact) — true squared L2, ascending.
    *
    * Hydration source: a freshly built index still carries the raw
    * vector column in `encoded`, but a MATERIALIZED index does not —
    * `writeIndex` drops it by design (codes + id only; the corpus is
    * the source of truth for raw vectors). Re-ranking an index opened
    * through `readIndex` therefore needs the corpus passed explicitly
    * (`corpus` = the idCol + vecCol frame the index was built from);
    * omitting it on such an index fails fast with a clear message
    * instead of an unresolved-column AnalysisException. */
  /** Scale-aware refine-pool size — the round-10 scaling finding made
    * the default (bm25_recall_r10.txt): a refine cutoff R held FIXED
    * while the corpus grew 84× collapsed family-excluded recall@10
    * from 0.894 to 0.250. The ADC stage actually scans ~n·nprobe/nlist
    * candidates per query, and PQ's lossy codes scatter the true top-k
    * through an ADC-ordered prefix whose depth grows with that pool —
    * so R must grow with it too, not with k alone (FAISS's fixed
    * `k_factor` expects the caller to retune it per corpus; this
    * default encodes the retune). R = max(4·k, ⌈n·nprobe/(6·nlist)⌉):
    * one sixth of the expected scanned pool — just above the measured
    * restore point (R=12,784 ≈ 0.15·pool → recall 0.819 vs the 0.913
    * exact-L2 metric ceiling on the 168k family-excluded corpus) — with
    * FAISS-practice k_factor=4 as the small-corpus floor. INTEGER
    * arithmetic only (ceil-div), so the DuckDB oracle reproduces R
    * bit-exactly — float `ceil` at integer boundaries is a known
    * engine-divergence trap. */
  def autoRefinePool(k: Int, n: Long, nlist: Int, nprobe: Int): Int = {
    require(k > 0 && n >= 0 && nlist > 0 && nprobe > 0,
      s"autoRefinePool(k=$k, n=$n, nlist=$nlist, nprobe=$nprobe)")
    val den = 6L * nlist
    val scaled = (n * nprobe + den - 1) / den
    math.min(math.max(4L * k, scaled), Int.MaxValue.toLong).toInt
  }

  /** @param rerank explicit k_factor: R = k·rerank (FAISS `refine`
    *   semantics). The default (0) is SCALE-AWARE: R =
    *   [[autoRefinePool]] of the index's corpus size — see the
    *   round-10 recall-collapse finding documented there. */
  def searchRerank(index: IvfPqIndex, queries: DataFrame, k: Int,
      nprobe: Int, rerank: Int = 0,
      corpus: Option[DataFrame] = None): DataFrame = {
    val poolSize =
      if (rerank > 0) k * rerank
      // index.n travels from build/read time — NO Spark job here (a
      // per-search count() was a metadata job for a materialized index
      // and a full assign+encode pipeline for an unmaterialized one —
      // the r11 ADVICE finding). Hand-assembled indexes without n keep
      // the old one-off count as the documented fallback.
      else autoRefinePool(k,
        if (index.n >= 0) index.n else index.encoded.count(),
        index.centroids.size, nprobe)
    val cand = search(index, queries, poolSize, nprobe)
      .select(col("q_id"), col(index.idCol))
    // hydrate raw vectors for the candidate pool only: broadcast the
    // small (q_id, id) set against the corpus's id+vector columns
    val hydrateFrom = corpus.getOrElse {
      require(index.encoded.columns.contains(index.vecCol),
        s"index has no raw-vector column '${index.vecCol}' (opened via " +
          "readIndex? writeIndex drops vectors at rest) — pass " +
          "corpus = the id+vector frame the index was built from")
      index.encoded
    }
    val raw = hydrateFrom.select(col(index.idCol),
      col(index.vecCol).as("__cand_vec"))
    val qv = queries.select(col("q_id"), col("q_vec"))
    val exact = raw.join(broadcast(cand), Seq(index.idCol))
      .join(broadcast(qv), Seq("q_id"))
      .withColumn("exact",
        GraftExtensions.l2Sq(col("q_vec"), col("__cand_vec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("exact").asc, col(index.idCol))
    exact.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(index.idCol), col("exact"))
  }
}
