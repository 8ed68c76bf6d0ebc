package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.{Ivf, Pq}

/** Round-5 continuation: the coarse/product quantizers put behind the
  * DuckDB oracle gate the way LSH was in round 3 (VERDICT r4 ask #3).
  * K-means isn't SQL-expressible, so the production builds stay
  * recall-gated in IvfSpec/PqSpec; these siblings swap ONLY the
  * training step for an engine-neutral md5-rank seed sample — every
  * other stage (assignment, probe ranking, encoding, ADC) is the
  * identical code path, now hash-match verified end to end.
  *
  *  - q_ann_ivf_oracle: md5-seeded IVF — seed choice, argmax-dot list
  *                      assignment, per-query probe ranking, in-list
  *                      cosine top-k (reference semantics: FAISS
  *                      IVFx flat per SURVEY §7.5)
  *  - q_ann_pq_oracle:  md5-seeded PQ — codebook slicing, argmin-l2
  *                      encoding, per-query distance tables, ADC
  *                      ranking (FAISS PQy layout)
  */
object QueriesExt10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    QueriesCommon.table(s, dir, name)

  /** IVF with md5-seeded centroids (`Ivf.buildMd5Seeded`): 8 lists,
    * probe the 2 nearest per query, cosine top-5 within the probed
    * lists. Every arithmetic step mirrors the oracle SQL exactly —
    * dot/‖c‖²-half assignment scores, −dot/√‖c‖ probe distances,
    * cosine ranking — all sequential double folds on both engines. */
  private def qAnnIvfOracle(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val index = Ivf.buildMd5Seeded(e, "vec_id", "embedding", nlist = 8)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Ivf.search(index, q, k = 5, nprobe = 2)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("q_id", "vec_id")
  }

  /** PQ with md5-seeded codebooks (`Pq.buildMd5Seeded`): 8 subspaces ×
    * 16 codes over 64-d vectors, ADC top-5 per query. The encoded index
    * is materialized once (build-once search-many, same as q_ann_pq). */
  private def qAnnPqOracle(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val index = Pq.buildMd5Seeded(e, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16)
    val mat = index.copy(encoded = QueriesExt4.matEncoded(index.encoded))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Pq.search(mat, q, k = 5)
      .withColumn("adc", round(col("adc"), 6))
      .orderBy("q_id", "vec_id")
  }

  /** A2's num_rows (`scripts/count_rows_hf.py:5-17`) computed locally:
    * exact corpus row count from parquet FOOTER metadata only
    * (`io.HfDataset.countRowsMetadata`) — no column data read, footer
    * reads sharded across executors. Oracle = the full COUNT(*), so
    * the gate proves metadata-count == scan-count. */
  private def qMetaCount(s: SparkSession, dir: String): DataFrame = {
    val n = graft.io.HfDataset.countRowsMetadata(s, s"$dir/documents.parquet")
    s.range(1).select(lit(n).as("n_rows"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_ivf_oracle" -> (qAnnIvfOracle(_, _)),
    "q_ann_pq_oracle" -> (qAnnPqOracle(_, _)),
    "q_meta_count" -> (qMetaCount(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_meta_count" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_rows FROM documents",
    // Mirrors Ivf.buildMd5Seeded + Ivf.search step for step. The seed
    // ranking (md5 of the id string), the assignment score form
    // dot(v,c) − dot(c,c)/2 with DESC/list_id tie-break (≡ Spark's
    // array_position-of-first-max), the probe distance
    // −dot(q,c)/√dot(c,c) ASC NULLS LAST, and the cosine form all match
    // the Spark expressions as sequential double folds.
    "q_ann_ivf_oracle" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sd AS (SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS list_id,
        |         v AS c FROM e),
        |seeds AS (SELECT list_id, c FROM sd WHERE list_id < 8),
        |asg AS (SELECT vec_id, v, list_id FROM (
        |    SELECT e.vec_id, e.v, s.list_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY (list_dot_product(e.v, s.c) - list_dot_product(s.c, s.c) / 2) DESC,
        |                 s.list_id) AS rn
        |    FROM e CROSS JOIN seeds s)
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |pr AS (SELECT q_id, qv, list_id FROM (
        |    SELECT q.q_id, q.qv, s.list_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.q_id
        |        ORDER BY (-list_dot_product(q.qv, s.c) / sqrt(list_dot_product(s.c, s.c))) ASC NULLS LAST,
        |                 s.list_id) AS rn
        |    FROM q CROSS JOIN seeds s)
        |  WHERE rn <= 2),
        |sc AS (SELECT pr.q_id, a.vec_id,
        |    list_dot_product(pr.qv, a.v) /
        |      (sqrt(list_dot_product(pr.qv, pr.qv)) * sqrt(list_dot_product(a.v, a.v))) AS sim
        |  FROM pr JOIN asg a ON pr.list_id = a.list_id AND a.vec_id <> pr.q_id),
        |r AS (SELECT q_id, vec_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn FROM sc)
        |SELECT q_id, vec_id, round(sim, 6) AS sim FROM r WHERE rn <= 5
        |ORDER BY q_id, vec_id""".stripMargin,
    // Mirrors Pq.buildMd5Seeded + Pq.search: codebook = sub-slices of
    // the 16 md5-ranked seeds; encoding argmin of Σ(x−c)² with
    // ASC/code tie-break (≡ array_position-of-first-min); adc = the
    // m=8 table lookups summed LEFT-ASSOCIATIVELY in subspace order
    // (the explicit + chain below ≡ Spark's reduce(_ + _) fold; a bare
    // SUM() would have engine-chosen order). min(CASE s=k) picks the
    // single row per subspace, so no aggregation-order ambiguity.
    "q_ann_pq_oracle" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sd AS (SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
        |         v AS c FROM e),
        |cb AS (SELECT code, c FROM sd WHERE code < 16),
        |sp AS (SELECT unnest(range(8)) AS s),
        |dpre AS (SELECT e.vec_id, sp.s, cb.code,
        |    list_transform(range(1, 9), j -> e.v[sp.s * 8 + j] - cb.c[sp.s * 8 + j]) AS d
        |  FROM e CROSS JOIN sp CROSS JOIN cb),
        |dist AS (SELECT vec_id, s, code, list_dot_product(d, d) AS dd FROM dpre),
        |codes AS (SELECT vec_id, s, code FROM (
        |    SELECT vec_id, s, code,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dd ASC, code ASC) AS rn
        |    FROM dist)
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |qpre AS (SELECT q.q_id, sp.s, cb.code,
        |    list_transform(range(1, 9), j -> q.qv[sp.s * 8 + j] - cb.c[sp.s * 8 + j]) AS d
        |  FROM q CROSS JOIN sp CROSS JOIN cb),
        |qt AS (SELECT q_id, s, code, list_dot_product(d, d) AS dd FROM qpre),
        |parts AS (SELECT qt.q_id, c2.vec_id, qt.s, qt.dd
        |  FROM codes c2 JOIN qt ON qt.s = c2.s AND qt.code = c2.code
        |  WHERE c2.vec_id <> qt.q_id),
        |adc AS (SELECT q_id, vec_id,
        |    min(CASE WHEN s = 0 THEN dd END) + min(CASE WHEN s = 1 THEN dd END)
        |  + min(CASE WHEN s = 2 THEN dd END) + min(CASE WHEN s = 3 THEN dd END)
        |  + min(CASE WHEN s = 4 THEN dd END) + min(CASE WHEN s = 5 THEN dd END)
        |  + min(CASE WHEN s = 6 THEN dd END) + min(CASE WHEN s = 7 THEN dd END) AS adc
        |  FROM parts GROUP BY q_id, vec_id),
        |r AS (SELECT q_id, vec_id, adc,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc ASC, vec_id) AS rn FROM adc)
        |SELECT q_id, vec_id, round(adc, 6) AS adc FROM r WHERE rn <= 5
        |ORDER BY q_id, vec_id""".stripMargin)
}
