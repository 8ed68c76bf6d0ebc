package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B of optimizer knobs on the PLANNING half of the sub-second
  * floor (FloorSplit showed 0.02-0.19 s/query of pure Catalyst work):
  * times `executedPlan` forcing alone, with constraint propagation on
  * vs off, for the floor-bound weak set. Constraint propagation is
  * the documented planning hotspot for filter-heavy plans
  * (SPARK-33152 lineage); it exists to derive extra filters the
  * engine's queries already state explicitly.
  */
object PlanFloorAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "q_range_join", "q_outliers", "q_anti_missing", "q_bloom_semi",
      "q_intersect_ids", "q_topk_per_group", "q_except_ids", "q_cube",
      "q_join_agg", "q_rollup", "q_hybrid_rrf", "q_bm25"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (mode <- Seq("cp_on", "cp_off", "cp_on2", "cp_off2")) {
      // branch-session override (round 8 fork scoping)
      System.setProperty("graft.branch.spark.sql.constraintPropagation.enabled",
        (!mode.startsWith("cp_off")).toString)
      var planTot = 0.0
      var runTot = 0.0
      for (name <- names) {
        val fn = graft.SparkEntry.queries(name)
        fn(spark, dir).count() // warm this mode's plan + codegen
        val plan = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).queryExecution.executedPlan
          (System.nanoTime() - t0) / 1e9
        }.min
        val run = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        planTot += plan; runTot += run
        println(f"$mode%-7s $name%-18s plan $plan%6.3f s  e2e $run%6.3f s")
      }
      println(f"$mode%-7s TOTAL              plan $planTot%6.3f s  e2e $runTot%6.3f s")
    }
    spark.stop()
  }
}
