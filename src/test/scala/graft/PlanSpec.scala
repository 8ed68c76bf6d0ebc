package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions: correctness tests prove WHAT is computed;
  * these prove HOW — filters and projections reach the parquet scan,
  * small dimensions broadcast, limits push down. At 100 TB these
  * properties are the difference between reading gigabytes and reading
  * everything, so they are pinned as tests rather than hoped for. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("q_scan_project: filter and projection are pushed into the parquet scan") {
    val p = plan(q("q_scan_project"))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,47"),
      s"no pushed filter in plan:\n$p")
    // pruned read schema: only the 4 selected columns are decoded
    assert(p.contains("ReadSchema") &&
      !p.contains("l_comment"), "projection not pruned")
  }

  test("q_idrange: between-range reaches the scan for row-group pruning") {
    val p = plan(q("q_idrange"))
    assert(p.contains("GreaterThanOrEqual(o_orderkey,1000") &&
      p.contains("LessThanOrEqual(o_orderkey,1200"), s"range not pushed:\n$p")
  }

  test("q_join_agg: dimension tables joined via broadcast, not shuffle") {
    val p = plan(q("q_join_agg"))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("q_topk: global sort-limit is a TakeOrderedAndProject, not a full sort") {
    val p = plan(q("q_topk"))
    assert(p.contains("TakeOrderedAndProject"), s"full sort instead of top-k:\n$p")
  }

  test("q1_agg: partial (map-side) aggregation before the shuffle") {
    val p = plan(q("q1_agg"))
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("readLimited: limit is pushed toward the scan (CollectLimit/GlobalLimit)") {
    val df = graft.io.VdfIO.readLimited(spark, s"$dir/orders.parquet", 5)
    val p = plan(df)
    assert(p.contains("CollectLimit") || p.contains("GlobalLimit"),
      s"no limit operator:\n$p")
  }

  test("scalar-function queries contain no UDFs and codegen compiles spans") {
    // text-analysis expressions must stay native (no UDFs in the plan)
    val p = plan(q("q_quality"))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "UDF leaked into scalar query plan")
    // whole-stage codegen actually produces compiled spans for the scan+filter
    val cg = q("q_scan_project").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen"), s"no codegen span:\n${cg.take(500)}")
  }

  test("q_semi_idlist: semi join, never a full join plus distinct") {
    val p = plan(q("q_semi_idlist"))
    assert(p.contains("LeftSemi"), s"semi-join not planned:\n$p")
  }

  test("q_anti_missing: anti join for missing-id detection") {
    val p = plan(q("q_anti_missing"))
    assert(p.contains("LeftAnti"), s"anti-join not planned:\n$p")
  }
}
