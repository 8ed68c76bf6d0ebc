package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result- and plan-level checks for the QueriesExt6 batch (the DuckDB
  * hash-match at sf0.01 is the primary gate; these pin the semantics
  * and the physical shape at sf0.001 so regressions fail fast). */
class QueriesExt6Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)
  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q_redact scrubs every injected email/ip and counts them") {
    val rows = q("q_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val redacted = r.getAs[String]("redacted")
      assert(r.getAs[Int]("n_emails") >= 1, "injected email not counted")
      assert(r.getAs[Int]("n_ips") >= 1, "injected ip not counted")
      assert(redacted.contains("<EMAIL>") && redacted.contains("<IP>"))
      assert(!redacted.contains("@example.com"), "email survived redaction")
    }
  }

  test("q_redact is map-only: no UDF, single exchange (presentation sort)") {
    val p = plan(q("q_redact"))
    assert(!p.contains("ScalaUDF"), "UDF leaked into redaction plan")
    val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges == 1, s"expected only the final sort exchange:\n$p")
  }

  test("q_tfidf_pairs: pairs inline from per-token arrays, no self-join") {
    val df = q("q_tfidf_pairs")
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
    // pairs come from exploding each token's probe array, and norms are
    // the diagonal of the same aggregation — the whole query must plan
    // without a single join operator
    assert(!p.contains("Join"), s"join crept back into the pair path:\n$p")
    assert(p.contains("explode"), s"inline pair generation missing:\n$p")
    // cosine is symmetric-bounded
    val bad = df.filter(col("cosine") > 1.000001 || col("cosine") < 0.3).count()
    assert(bad == 0, "cosine outside [threshold, 1]")
  }

  test("q_lm_score: LM train + score is two exchanges, no count-table join") {
    val df = q("q_lm_score")
    val p = plan(df)
    // both count tables are windows over one w1 partitioning — a
    // corpus-scale join on the bigram key must never appear
    assert(!p.contains("SortMergeJoin"), s"count-table join crept in:\n$p")
    // one sort serves both windows ((w1,w2) covers the w1 frame)
    assert(p.split("Window").length >= 3, s"expected two window ops:\n$p")
    import spark.implicits._
    val rows = df.as[(Long, Long, Double)].collect()
    // smoothed probabilities are < 1, so cross-entropy is positive
    assert(rows.nonEmpty && rows.forall(_._3 > 0))
    // every scored doc carries at least one bigram
    assert(rows.forall(_._2 >= 1))
  }

  test("q_bm25: one corpus shuffle; length normalization never joins") {
    val df = q("q_bm25")
    val p = plan(df)
    // the probe-vocab prune is a broadcast semi join ahead of the
    // corpus exchange
    assert(p.contains("LeftSemi"), s"probe-vocab prune missing:\n$p")
    // dl travels inline with the token rows — a corpus-sized dl join
    // would appear as a SortMergeJoin; the only joins allowed are the
    // broadcast semi (prune) + broadcast nested-loop (1-row stats)
    assert(!p.contains("SortMergeJoin"), s"corpus join crept in:\n$p")
    // scores are bounded and the output is top-10 per query
    import spark.implicits._
    val perQuery = df.groupBy("query_id").count().as[(Long, Long)].collect()
    assert(perQuery.nonEmpty && perQuery.forall(_._2 <= 10))
    // a probe doc must rank itself (it shares every token with itself)
    val self = df.filter(col("query_id") === col("doc_id")).count()
    assert(self == perQuery.length, "each query's own doc must surface")
  }

  test("q_dedup_best keeps exactly one (longest) doc per fingerprint") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("fp", md5(substring(col("text"), 1, 40)))
    val nFps = docs.select("fp").distinct().count()
    val survivors = q("q_dedup_best")
    assert(survivors.count() == nFps, "one survivor per fingerprint")
    // the survivor really is the longest member of its group
    val maxLen = docs.groupBy("fp").agg(max("n_chars").as("max_chars"))
    val mismatch = survivors.join(maxLen, "fp")
      .filter(col("n_chars") =!= col("max_chars")).count()
    assert(mismatch == 0, "survivor is not the longest doc in its group")
  }

  test("q_dedup_best shares one hash exchange across both windows") {
    val p = plan(q("q_dedup_best"))
    val hashEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"windows should reuse the fp partitioning:\n$p")
  }

  test("q_bloom_semi: bloom prefilter in plan, result equals plain semi-join") {
    val df = q("q_bloom_semi")
    val p = plan(df)
    assert(p.contains("might_contain"), s"bloom prefilter missing:\n$p")
    assert(p.contains("bloom_filter_agg"), s"bloom aggregate missing:\n$p")
    // the prefilter may pass false positives; the trailing exact semi
    // join must remove them — result equals the un-prefiltered version
    val plain = SparkEntry.queries("q_semi_idlist")(spark, dir)
    val viaBloom = df.agg(sum("n")).first().getLong(0)
    val viaPlain = plain.agg(sum("n")).first().getLong(0)
    assert(viaBloom == viaPlain, "bloom path changed the semi-join result")
  }

  test("q_outliers: outliers are a subset and MAD is non-negative") {
    val rows = q("q_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
      assert(r.getAs[Double]("mad") >= 0.0)
    }
  }
}
