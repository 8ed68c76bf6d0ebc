package graft

import java.nio.file.Files

/** Regression tests for the round-11 ADVICE findings fixed in round 12:
  * the qJoinAgg dim-attach restructure above the broadcast gate, and
  * the recursive source fingerprint. (The GrpcH2 findings are covered
  * in GrpcH2Spec.) */
class AdviceR12Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_join_agg: the pre-aggregate-by-custkey shape above the broadcast gate is value-identical to the broadcast shape") {
    val q = SparkEntry.queries("q_join_agg")
    def run(): Seq[org.apache.spark.sql.Row] = q(spark, sf).collect().toSeq
    // default gate: customer at sf0.001 is tiny → broadcast shape
    System.clearProperty("graft.broadcastDimMaxBytes")
    val viaBroadcast = run()
    assert(viaBroadcast.nonEmpty)
    try {
      // gate at 0: every dim is "too big" → the restructured shape
      // (revenue pre-aggregated by o_custkey below the dim joins,
      // customer attached with a small shuffled join, no driver-side
      // HashedRelation build). Decimal sums and counts re-associate
      // exactly and c_custkey is unique, so the results must match to
      // the last bit.
      System.setProperty("graft.broadcastDimMaxBytes", "0")
      val viaPreAgg = run()
      assert(viaPreAgg == viaBroadcast)
      // and the restructure is really in the executed plan: the
      // revenue aggregation (keyed by o_custkey) sits BELOW the
      // customer join, so the dim attaches to ≤|custkey| partials —
      // never to raw spine rows, never via an explicit broadcast hint.
      // (The planner may still choose to broadcast a genuinely tiny
      // customer from its own estimates — that's its call, made from
      // measured sizes, not a hint that would force a driver build of
      // an arbitrarily large dim.)
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("HashAggregate(keys=[o_custkey"),
        s"pre-aggregate by custkey missing above the gate:\n$plan")
    } finally System.clearProperty("graft.broadcastDimMaxBytes")
  }

  test("sourceFingerprint walks nested layouts recursively") {
    import graft.ops.Scale
    val root = Files.createTempDirectory("fp").toFile
    def put(rel: String, content: String): java.io.File = {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      Files.writeString(f.toPath, content)
      f
    }
    put("part=a/x.parquet", "aaaa")
    put("part=b/x.parquet", "bbbb")
    Scale.invalidateFingerprints()
    val fp1 = Scale.sourceFingerprint(root.toString)
    // regenerating ONE nested partition file IN PLACE (same name, new
    // size) leaves the ROOT status untouched — the r13 memoization's
    // documented staleness bound serves the cached value here …
    put("part=b/x.parquet", "bbbb-regenerated")
    assert(Scale.sourceFingerprint(root.toString) == fp1,
      "root status unchanged: the memoized fingerprint must be served")
    // … and after invalidation the RECURSIVE walk sees the nested
    // change (the r12 fix this test pins: a non-recursive listing saw
    // only the partition directories and missed it)
    Scale.invalidateFingerprints()
    val fp2 = Scale.sourceFingerprint(root.toString)
    assert(fp1 != fp2)
    // same-named files in different subdirectories are distinct
    // entries (relative paths, not bare names)
    val flat = Files.createTempDirectory("fpflat").toFile
    Files.writeString(new java.io.File(flat, "x.parquet").toPath, "aaaa")
    assert(Scale.sourceFingerprint(flat.toString) != fp1)
  }
}
