package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 continuation batch 3: dataset-versioning operators —
  *
  *  - q_corpus_diff: snapshot diff between two corpus versions (the
  *                   dataset-curation loop's "what changed" step):
  *                   one full-outer join on id + fingerprint compare,
  *                   classifying added / removed / changed / same
  *  - q_merge_cdc:   CDC MERGE — apply a changes table (upserts +
  *                   tombstone deletes) onto a base table, the
  *                   lakehouse MERGE INTO semantics as one full-outer
  *                   join; survivors = coalesce(change, base) minus
  *                   deletes
  *
  * Both derive the second input deterministically from the corpus (the
  * gate needs identical inputs in both engines); the operators read any
  * two tables in production.
  */
object QueriesExt9 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    QueriesCommon.table(s, dir, name)

  /** Fresh-id offset = max(doc_id)+1: synthesized ids can never
    * collide with real ones at ANY scale factor (a fixed constant
    * would collide once the corpus passes that many docs, silently
    * degrading 'added'/insert semantics even though both engines would
    * still agree). The oracle SQL computes the same offset with a
    * scalar subquery.
    *
    * Resolved ONCE per input directory and cached, like
    * `QueriesCommon`'s schema cache: a column max is a table-level
    * statistic (every parquet footer carries it; a metastore serves
    * it), and folding it to a literal removes the broadcast-build job
    * and the cross-join a one-row scalar relation would cost on every
    * run — the multiple-jobs-per-query floor this query paid. The
    * probe itself is a bounded single-row collect. */
  private val idOffCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def idOff(dir: String, docs: DataFrame): Long =
    idOffCache.computeIfAbsent(dir,
      _ => docs.agg((max(col("doc_id")) + 1L).as("id_off")).head.getLong(0))

  /** v2 := drop every 7th doc, rewrite every 5th, add 50 fresh ids —
    * the deterministic "next snapshot" both engines construct. */
  private def v2(dir: String, docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(
        docs.orderBy("doc_id").limit(50)
          .select((col("doc_id") + lit(idOff(dir, docs))).as("doc_id"),
          concat(lit("new "), col("text")).as("text"),
          col("lang"), col("source"), col("n_chars")))

  /** Snapshot diff: classify every id across two versions with ONE
    * full-outer join on the id, comparing content fingerprints (never
    * the full text — at 100 TB the fingerprint column is what moves
    * through the shuffle). Emits per-status counts. */
  private def qCorpusDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val a = docs.select(col("doc_id"), md5(col("text")).as("fp_a"))
    val b = v2(dir, docs).select(col("doc_id"), md5(col("text")).as("fp_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(when(col("fp_a").isNull, "added")
        .when(col("fp_b").isNull, "removed")
        .when(col("fp_a") =!= col("fp_b"), "changed")
        .otherwise("same").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
  }

  /** Changes table: upserts for every 10th doc (rewritten text), a
    * tombstone for every 11th, inserts for 30 fresh ids. */
  private def changes(dir: String, docs: DataFrame): DataFrame = {
    // a doc can be both %10 and %11 (e.g. 110): tombstone wins, like a
    // MERGE whose WHEN MATCHED DELETE clause fires first — expressed
    // directly in the upsert predicate (the oracle SQL's
    // `% 10 = 0 AND % 11 <> 0`), not as an anti-join the planner
    // would have to execute
    val upserts = docs.filter(pmod(col("doc_id"), lit(10)) === 0 &&
        pmod(col("doc_id"), lit(11)) =!= 0)
      .select(col("doc_id"), concat(lit("updated "), col("text")).as("text"),
        lit(false).as("deleted"))
    val deletes = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        lit(true).as("deleted"))
    val inserts = docs.orderBy("doc_id").limit(30)
      .select((col("doc_id") + lit(idOff(dir, docs))).as("doc_id"),
        concat(lit("inserted "), col("text")).as("text"),
        lit(false).as("deleted"))
    upserts.unionByName(deletes).unionByName(inserts)
  }

  /** MERGE INTO semantics as one full-outer join: matched+tombstone →
    * drop, matched+upsert → change row wins, unmatched change →
    * insert, unmatched base → keep. Emits survivor-set statistics
    * (count + content hash groups) so the gate checks the whole merged
    * state, not a sample. */
  private def qMergeCdc(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val ch = changes(dir, t(s, dir, "documents"))
    val merged = base.select(col("doc_id"), col("text").as("base_text"))
      .join(ch, Seq("doc_id"), "full_outer")
      .filter(col("deleted").isNull || !col("deleted"))
      .select(col("doc_id"),
        coalesce(col("text"), col("base_text")).as("text"))
    merged.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("doc_id")).as("n_ids"),
      sum(when(col("text").startsWith("updated "), 1L).otherwise(0L)).as("n_updated"),
      sum(when(col("text").startsWith("inserted "), 1L).otherwise(0L)).as("n_inserted"))
  }

  /** Per-label elementwise vector statistics as posexplode +
    * (label, dim) hash aggregate — whole-stage-codegen'd end to end.
    * The d× row amplification stays MAP-SIDE: partial aggregation
    * collapses each partition to its (labels × dims) running entries
    * before the one exchange, so shuffle volume is groups × d per
    * partition regardless of corpus size — the same bound the typed
    * Aggregator formulation (`VectorAggregates.elementwiseStats`, kept
    * as the typed-API operator with its own spec) achieves with a
    * 3-array buffer, without its non-codegen ObjectHashAggregate
    * per-row object cost (measured 4× slower at sf0.1). */
  private def qVecStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "e")))
      .select(col("label"), col("dim"), col("e").cast("double").as("e"))
      .groupBy("label", "dim")
      .agg(round(min(col("e")), 6).as("vmin"),
        round(max(col("e")), 6).as("vmax"),
        round(sum(col("e")) / count(lit(1)), 6).as("vmean"))
      .orderBy("label", "dim")

  /** Cross-source overlap matrix: for every ordered source pair, how
    * many distinct content fingerprints they share (diagonal = each
    * source's own distinct-content count) — the "is one source a
    * re-crawl of another" curation analytic. One fingerprint-keyed
    * self-join over the DISTINCT (source, fp) projection: at 100 TB
    * the joined relation is #distinct-contents × #holding-sources,
    * already deduplicated, and the matrix output is |sources|². */
  private def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val fps = t(s, dir, "documents")
      .select(col("source"), md5(col("text")).as("fp")).distinct()
    fps.toDF("src_a", "fp")
      .join(fps.toDF("src_b", "fp"), "fp")
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("src_a", "src_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_diff" -> (qCorpusDiff(_, _)),
    "q_merge_cdc" -> (qMergeCdc(_, _)),
    "q_vec_stats" -> (qVecStats(_, _)),
    "q_source_overlap" -> (qSourceOverlap(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_source_overlap" ->
      """WITH fps AS (SELECT DISTINCT source, md5(text) AS fp FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |FROM fps a JOIN fps b ON a.fp = b.fp
        |GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,
    "q_vec_stats" ->
      """SELECT label, i - 1 AS dim,
        |  round(CAST(min(e) AS DOUBLE), 6) AS vmin,
        |  round(CAST(max(e) AS DOUBLE), 6) AS vmax,
        |  round(sum(CAST(e AS DOUBLE)) / count(*), 6) AS vmean
        |FROM (SELECT label, UNNEST(embedding) AS e,
        |        generate_subscripts(embedding, 1) AS i
        |      FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "q_corpus_diff" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL BY NAME
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
        |    'new ' || text AS text
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 50)),
        |a AS (SELECT doc_id, md5(text) AS fp_a FROM documents),
        |b AS (SELECT doc_id, md5(text) AS fp_b FROM v2),
        |d AS (SELECT CASE WHEN fp_a IS NULL THEN 'added'
        |                  WHEN fp_b IS NULL THEN 'removed'
        |                  WHEN fp_a <> fp_b THEN 'changed'
        |                  ELSE 'same' END AS status
        |      FROM a FULL OUTER JOIN b USING (doc_id))
        |SELECT status, count(*) AS n FROM d GROUP BY status ORDER BY status""".stripMargin,
    "q_merge_cdc" ->
      """WITH up AS (SELECT doc_id, 'updated ' || text AS text, false AS deleted
        |            FROM documents WHERE doc_id % 10 = 0 AND doc_id % 11 <> 0),
        |del AS (SELECT doc_id, NULL::VARCHAR AS text, true AS deleted
        |        FROM documents WHERE doc_id % 11 = 0),
        |ins AS (SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
        |          'inserted ' || text AS text, false AS deleted
        |        FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 30)),
        |ch AS (SELECT * FROM up UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins),
        |m AS (SELECT coalesce(ch.doc_id, b.doc_id) AS doc_id,
        |        coalesce(ch.text, b.text) AS text, ch.deleted
        |      FROM documents b FULL OUTER JOIN ch ON b.doc_id = ch.doc_id
        |      )
        |SELECT count(*) AS n_rows, count(DISTINCT doc_id) AS n_ids,
        |  CAST(sum(CASE WHEN text LIKE 'updated %' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
        |  CAST(sum(CASE WHEN text LIKE 'inserted %' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted
        |FROM m WHERE deleted IS NULL OR NOT deleted""".stripMargin)
}
