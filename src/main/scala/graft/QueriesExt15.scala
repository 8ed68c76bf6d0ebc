package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.{Coreset, Pca}

/** Round-13 linear-algebra layer: PCA / linear projection over the
  * embedding column (SURVEY §7.5 — dimensionality reduction before
  * clustering/ANN, subspace balancing before PQ).
  *
  * Gating splits along the repo's standard trained-operator seam:
  *
  *  - q_pca_cov:     the DISTRIBUTED stats pass — the exact
  *                   `Pca.CovStats` Aggregator buffer `fit` consumes,
  *                   formatted long as (i, j, cov) and capped to the
  *                   16×16 leading block so the oracle's d²-row unnest
  *                   self-join stays cheap at 1.4 GiB (the cap bounds
  *                   the ORACLE join, not the Spark buffer — the full
  *                   triangle aggregates either way).
  *  - q_jl_project:  the fused projection KERNEL
  *                   (`MatVecProject`, the same expression PCA
  *                   projection runs) under an engine-neutral
  *                   md5-derived ±1 matrix — signs both engines read
  *                   off the same hex digit, the projection analogue
  *                   of `Ivf.buildMd5Seeded`'s seeded centroids. Also
  *                   an operator in its own right: JL random
  *                   projection is the cheap-and-cheerful
  *                   dim-reduction baseline (Achlioptas 2003's ±1
  *                   construction).
  *  - q_pca_project: the production path end to end (fit k=16 →
  *                   project) — NO SQL oracle (eigenvectors aren't
  *                   SQL-expressible); rows-only check by the driver,
  *                   gated by the two oracle siblings above plus
  *                   PcaSpec's eigensolver rows (known matrices,
  *                   orthonormality, diagonalization, agreement with
  *                   a naive driver reference on real rows).
  *  - q_kcenter:     greedy farthest-point selection (`Coreset`) —
  *                   the ENTIRE k=4 greedy loop under the oracle via
  *                   chained MATERIALIZED CTEs (seed, incremental
  *                   max-score update, argmax with id tie-break).
  */
object QueriesExt15 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    QueriesCommon.table(s, dir, name)

  private def embDim(e: DataFrame): Int =
    e.select(size(col("embedding")).as("d"))
      .filter(col("d") > 0).head().getInt(0)

  /** Leading 16×16 block of the sample covariance, long format. */
  private def qPcaCov(s: SparkSession, dir: String): DataFrame =
    Pca.covarianceDf(t(s, dir, "embeddings"), "embedding", maxDim = 16)
      .orderBy("i", "j")

  /** JL ±1 projection to 8 dims through the fused kernel, exploded to
    * (vec_id, r, proj) rows. */
  private def qJlProject(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val mat = Pca.md5SignMatrix(rows = 8, dim = embDim(e))
    e.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        posexplode(Pca.matVec(col("embedding"), mat,
          new Array[Double](mat.head.length))))
      .select(col("vec_id"), col("pos").as("r"), col("col").as("proj"))
      .orderBy("vec_id", "r")
  }

  /** Production PCA: fit a k=16 model (one moment pass + driver
    * Jacobi), project the corpus map-only through the fused kernel. */
  private def qPcaProject(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val model = Pca.fit(e, "embedding", k = 16)
    e.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        posexplode(Pca.project(col("embedding"), model)))
      .select(col("vec_id"), col("pos").as("r"), col("col").as("proj"))
      .orderBy("vec_id", "r")
  }

  /** Greedy farthest-point (k-center) selection, k=4: the WHOLE loop
    * — md5-rank seed, incremental max-score update, argmax pick with
    * id tie-break — mirrored as chained MATERIALIZED CTEs in DuckDB
    * (the q_bpe_learn_oracle pattern). Every distance derives from
    * left-to-right double dot products on both engines. */
  private def qKcenter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val picks = Coreset.select(t(s, dir, "embeddings"), "vec_id",
      "embedding", k = 4)
    picks.map(p => (p.rank, p.id.asInstanceOf[Long], p.minDistSq))
      .toDF("rank", "vec_id", "md")
      .select(col("rank"), col("vec_id"), round(col("md"), 6).as("md"))
      .orderBy("rank")
  }

  /** The Gram-free sweep kernel (r14): S = Σᵥ v·(vᵀqⱼ) under the
    * md5 ±1 probe, leading 16 dims × k=4 probes, long format — the
    * one-corpus-pass building block `Pca.fitGramFree` iterates for
    * dimensions past the moment-buffer ceiling, gated exactly as
    * q_pca_cov gates the moment pass (the probe is q_jl_project's
    * sign matrix, so the oracle reuses both proven CTE idioms). */
  private def qPcaPowerstep(s: SparkSession, dir: String): DataFrame =
    Pca.powerStepDf(t(s, dir, "embeddings"), "embedding", k = 4, maxDim = 16)
      .orderBy("i", "j")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pca_cov" -> (qPcaCov(_, _)),
    "q_jl_project" -> (qJlProject(_, _)),
    "q_pca_project" -> (qPcaProject(_, _)),
    "q_pca_powerstep" -> (qPcaPowerstep(_, _)),
    "q_kcenter" -> (qKcenter(_, _)))

  def oracleSql: Map[String, String] = Map(
    "q_pca_cov" ->
      """WITH u AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS e
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
        |)
        |SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
        |  (SUM(a.e * b.e) - SUM(a.e) * SUM(b.e) / COUNT(*)) / (COUNT(*) - 1) AS cov
        |FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
        |WHERE a.i < 16 AND b.i < 16
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_jl_project" ->
      """WITH u AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS e
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
        |), rr AS (SELECT UNNEST(range(8)) AS r)
        |SELECT u.vec_id, CAST(rr.r AS INT) AS r,
        |  SUM(CASE WHEN ascii(substr(md5(CAST(rr.r AS VARCHAR) || '_' ||
        |                               CAST(u.i AS VARCHAR)), 1, 1)) % 2 = 0
        |           THEN u.e ELSE -u.e END) AS proj
        |FROM u CROSS JOIN rr
        |GROUP BY u.vec_id, rr.r
        |ORDER BY u.vec_id, r""".stripMargin,
    "q_pca_powerstep" ->
      // u = the q_pca_cov unnest; t = q_jl_project's md5-sign dot
      // products vᵀqⱼ; then one weighted re-join: S(i,j) = Σ vᵢ·t(v,j).
      // Raw doubles — check.py's 1e-9 rel tol absorbs summation-order
      // ulps exactly as q_pca_cov's cov column does.
      """WITH u AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS e
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
        |), rr AS (SELECT UNNEST(range(4)) AS r),
        |t AS (SELECT u.vec_id, rr.r,
        |    SUM(CASE WHEN ascii(substr(md5(CAST(rr.r AS VARCHAR) || '_' ||
        |                                 CAST(u.i AS VARCHAR)), 1, 1)) % 2 = 0
        |             THEN u.e ELSE -u.e END) AS tv
        |  FROM u CROSS JOIN rr GROUP BY u.vec_id, rr.r)
        |SELECT CAST(a.i AS INT) AS i, CAST(t.r AS INT) AS j,
        |  SUM(a.e * t.tv) AS s
        |FROM u a JOIN t ON a.vec_id = t.vec_id
        |WHERE a.i < 16
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_kcenter" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL
        |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
        |c0 AS MATERIALIZED (SELECT vec_id, v FROM e
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
        |s1 AS MATERIALIZED (SELECT e.vec_id, e.v,
        |    list_dot_product(e.v, c0.v) - list_dot_product(c0.v, c0.v) / 2 AS ms
        |  FROM e CROSS JOIN c0),
        |c1 AS MATERIALIZED (SELECT vec_id, v, list_dot_product(v, v) - 2 * ms AS md
        |  FROM s1 ORDER BY md DESC, vec_id LIMIT 1),
        |s2 AS MATERIALIZED (SELECT s1.vec_id, s1.v,
        |    GREATEST(s1.ms, list_dot_product(s1.v, c1.v) - list_dot_product(c1.v, c1.v) / 2) AS ms
        |  FROM s1 CROSS JOIN c1),
        |c2 AS MATERIALIZED (SELECT vec_id, v, list_dot_product(v, v) - 2 * ms AS md
        |  FROM s2 ORDER BY md DESC, vec_id LIMIT 1),
        |s3 AS MATERIALIZED (SELECT s2.vec_id, s2.v,
        |    GREATEST(s2.ms, list_dot_product(s2.v, c2.v) - list_dot_product(c2.v, c2.v) / 2) AS ms
        |  FROM s2 CROSS JOIN c2),
        |c3 AS MATERIALIZED (SELECT vec_id, v, list_dot_product(v, v) - 2 * ms AS md
        |  FROM s3 ORDER BY md DESC, vec_id LIMIT 1)
        |SELECT CAST(0 AS INT) AS rank, vec_id, CAST(0.0 AS DOUBLE) AS md FROM c0
        |UNION ALL SELECT 1, vec_id, round(md, 6) FROM c1
        |UNION ALL SELECT 2, vec_id, round(md, 6) FROM c2
        |UNION ALL SELECT 3, vec_id, round(md, 6) FROM c3
        |ORDER BY rank""".stripMargin)
}
