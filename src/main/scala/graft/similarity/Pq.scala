package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/** Product quantization (PQ) for approximate nearest-neighbor search
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — the compression scheme behind FAISS IVF-PQ).
  *
  * The vector space is split into `m` subspaces; each subspace gets its
  * own `ksub`-centroid codebook, and a vector is stored as `m` small
  * codes (m bytes for ksub=256) instead of d floats — a 16-64×
  * compression that is the difference between "the index fits in
  * executor memory at 100 TB corpus scale" and "it doesn't". Search
  * uses asymmetric distance computation (ADC): the query precomputes a
  * (m × ksub) table of exact sub-distances ONCE, and each corpus
  * candidate costs m table lookups instead of d multiplications.
  *
  * Spark shape: codebook training is driver-side over a bounded sample
  * (same rationale as `Ivf.build` — the codebook needs a sketch, not
  * the corpus); ENCODING, the corpus-scale stage, is an argmin over
  * codegen'd `l2Sq` expressions per subspace — one narrow projection,
  * no shuffle; ADC scoring broadcasts the per-query tables and ranks
  * with the usual top-k window.
  */
object Pq {

  /** Trained product quantizer: `codebooks(s)(c)` = centroid c of
    * subspace s; `dsub` = dims per subspace; `encoded` = input rows +
    * `codes: array<int>` of length m. */
  final case class PqIndex(
      codebooks: Array[Array[Array[Float]]],
      dsub: Int,
      encoded: DataFrame,
      idCol: String,
      vecCol: String)

  /** Train per-subspace codebooks on a bounded deterministic sample and
    * encode every vector. `dim` must be divisible by `m`. The cap takes
    * the first `trainCap` rows in HASH order of the id (seeded), not id
    * order — id order correlates with content under time/topic-ordered
    * ingest, which would bias the codebooks toward the head of the
    * corpus. */
  def build(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, ksub: Int, seed: Long = 42L, maxIter: Int = 10,
      trainCap: Int = 16384): PqIndex = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val train: Array[Array[Float]] = vecs
      .select(col(idCol), col(vecCol).cast("array<float>").as(vecCol))
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol)).limit(trainCap)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(train.length >= ksub, s"need at least $ksub training vectors")
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { s =>
      val sub = train.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      // distinct seed per subspace, deterministic overall
      Ivf.lloyd(sub, ksub, maxIter, seed + s).map(_._2).toArray
    }
    // `encoded` IS the searchable corpus: rows the codes can't be
    // computed for (null / mis-sized vectors) are excluded here, not
    // carried as null-code rows — so a persisted layout, a fallback
    // `encoded.count()`, and the build-time n all agree (r12 ADVICE)
    val encoded = vecs
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .withColumn("codes", encodeExpr(col(vecCol), codebooks, dsub))
    PqIndex(codebooks, dsub, encoded, idCol, vecCol)
  }

  /** Engine-neutral deterministic PQ build for oracle gating: the
    * codebook of every subspace is the sub-slice of the same `ksub`
    * corpus vectors that rank FIRST by `md5(CAST(id AS STRING))` —
    * a seeded sample any SQL engine reproduces — while encoding and
    * ADC search run the identical expression paths as the k-means
    * build. Production stays `build` (per-subspace Lloyd, recall-gated
    * in PqSpec); this gates the full PQ route — codebook derivation,
    * argmin-l2 encoding, distance tables, ADC ranking — against the
    * DuckDB oracle (q_ann_pq_oracle). */
  def buildMd5Seeded(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int): PqIndex = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val seeds: Array[Array[Float]] = vecs
      .select(col(idCol), col(vecCol).cast("array<float>").as(vecCol))
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(ksub)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(seeds.length >= ksub, s"need at least $ksub seed vectors")
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { s =>
      seeds.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
    }
    // same searchable-corpus contract as `build` (see comment there)
    val encoded = vecs
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .withColumn("codes", encodeExpr(col(vecCol), codebooks, dsub))
    PqIndex(codebooks, dsub, encoded, idCol, vecCol)
  }

  /** codes[s] = argmin_c ‖v_sub(s) − codebook(s)(c)‖², all m subspaces
    * in the single fused `PqEncode` expression (ties → lowest code;
    * short/null-element subspaces → null code — identical per-subspace
    * semantics to the old per-code l2Sq array + array_position argmin,
    * spec-pinned). The old formulation inlined m×ksub distance loops
    * into one generated method — past the JVM huge-method limit at the
    * ksub=256 every real PQ uses, the corpus-scale encode stage ran as
    * interpreted bytecode (the Ivf.assign story, same fix — see
    * NearestList's scaladoc; measured in pq_encode_probe_r13c.txt).
    * Top-level null vectors are excluded by both build paths before
    * encoding (the r12 ADVICE rule above), so the fused form's
    * null-out-for-null-in is unreachable there. */
  private[similarity] def encodeExpr(vec: Column, codebooks: Array[Array[Array[Float]]],
      dsub: Int): Column = {
    require(codebooks.head.head.length == dsub, "dsub mismatch")
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.PqEncode(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec), codebooks))
  }

  /** (m × ksub) ADC distance table for a query vector column:
    * dtable[s][c] = ‖q_sub(s) − codebook(s)(c)‖². Shared by `Pq.search`
    * and `IvfPq.search` so the two paths can't drift. */
  private[similarity] def dtableExpr(codebooks: Array[Array[Array[Float]]],
      dsub: Int, qVec: Column): Column =
    array(codebooks.indices.map { s =>
      val sub = slice(qVec, s * dsub + 1, dsub)
      array(codebooks(s).map(c => GraftExtensions.l2Sq(sub, lit(c))): _*)
    }: _*)

  /** ADC distance: m table lookups + sum, UNROLLED at plan-build time
    * (m is a plan constant) into a chain of element_at adds — plain
    * Catalyst expressions that stay inside whole-stage codegen, where
    * the equivalent zip_with+aggregate lambda evaluates interpreted
    * (measured 2× on the candidate-scoring stage at 20k vectors). Null
    * codes (null or mis-sized source vector) propagate to a null adc. */
  private[similarity] def adcExpr(codes: Column, dtable: Column,
      m: Int): Column =
    (0 until m).map { s =>
      element_at(element_at(dtable, s + 1), element_at(codes, s + 1) + 1)
    }.reduce(_ + _)

  /** Top-k by ascending adc per query. Rows with null adc (un-encodable
    * vectors) are dropped — under Spark's ASC NULLS FIRST default they
    * would otherwise outrank every real neighbor. */
  private[similarity] def topK(scored: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc").asc, col(idCol))
    scored.filter(col("adc").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(idCol), col("adc"))
  }

  /** ADC top-k: per query, exact per-subspace distance tables (computed
    * as column expressions against the broadcast-size query side), then
    * each candidate scores with m table lookups. Returns
    * (q_id, idCol, adc) — smaller adc = closer (squared L2). */
  def search(index: PqIndex, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("q_id"),
      dtableExpr(index.codebooks, index.dsub, col("q_vec")).as("__dt"))
    val scored = index.encoded
      .select(col(index.idCol), col("codes"))
      .join(broadcast(q))
      .filter(col("q_id") =!= col(index.idCol))
      .withColumn("adc", adcExpr(col("codes"), col("__dt"), index.codebooks.length))
    topK(scored, index.idCol, k)
  }
}
