package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariant checks for the hybrid/multi-vector retrieval batch; the
  * DuckDB hash-match at sf0.01 is the primary gate. */
class QueriesExt11Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("hybrid_rrf: fused score is exactly the rank formula over present legs") {
    val rows = q("q_hybrid_rrf").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = if (r.isNullAt(r.fieldIndex("lex_rank"))) None
        else Some(r.getInt(r.fieldIndex("lex_rank")))
      val den = if (r.isNullAt(r.fieldIndex("dense_rank"))) None
        else Some(r.getInt(r.fieldIndex("dense_rank")))
      assert(lex.isDefined || den.isDefined, "doc in neither leg survived fusion")
      val expect = lex.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        den.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      val got = r.getDouble(r.fieldIndex("rrf"))
      assert(math.abs(got - expect) < 1e-8,
        s"rrf mismatch: $got vs $expect at $r")
      (lex.toSeq ++ den.toSeq).foreach(x => assert(x >= 1 && x <= 10))
    }
  }

  test("hybrid_rrf: per-query top-10, queries are the probe ids, both-leg docs dominate") {
    val df = q("q_hybrid_rrf")
    val per = df.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
    assert(per.map(_.getLong(1)).forall(_ <= 10))
    assert(per.map(_.getLong(0)).toSet.subsetOf((0L until 5L).toSet))
    // a doc present in BOTH legs outranks any doc present in one leg at
    // equal-or-worse ranks: 1/(60+a)+1/(60+b) > 1/(60+min(a,b))
    val both = df.filter(col("lex_rank").isNotNull && col("dense_rank").isNotNull)
    val single = df.filter(col("lex_rank").isNull || col("dense_rank").isNull)
    if (both.count() > 0 && single.count() > 0) {
      val worstBoth = both.agg(min("rrf")).head().getDouble(0)
      // any single-leg doc whose one rank is worse than both of the
      // both-leg doc's ranks must score lower — spot-check the extremes
      val bestSingleRankOnly = single
        .select(coalesce(col("lex_rank"), col("dense_rank")).as("r"))
        .agg(max("r")).head().getInt(0)
      assert(worstBoth > 1.0 / (60.0 + bestSingleRankOnly) - 1e-12)
    }
  }

  test("maxsim: no self-retrieval, top-5 per query, score matches a driver recompute") {
    val out = q("q_maxsim").collect()
    assert(out.forall(r => r.getLong(0) != r.getLong(1)), "self-match leaked")
    val perQ = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQ.keySet == Set(0L, 1L) && perQ.values.forall(_ == 5), s"$perQ")
    // independent driver-side recompute for the top pair of q_doc=0
    val top = out.filter(_.getLong(0) == 0L)
      .maxBy(_.getDouble(2))
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    def doc(d: Long): Seq[Array[Double]] =
      vecs.collect { case (id, v) if id / 8 == d => (id, v) }
        .toSeq.sortBy(_._1).map(_._2)
    val expect = doc(0L).map { qv =>
      doc(top.getLong(1)).map(dv =>
        qv.zip(dv).map { case (a, b) => a * b }.sum).max
    }.sum
    assert(math.abs(top.getDouble(2) - expect) < 1e-4,
      s"maxsim ${top.getDouble(2)} vs recompute $expect")
  }
}
