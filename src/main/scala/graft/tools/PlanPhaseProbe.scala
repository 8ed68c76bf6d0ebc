package graft.tools

import org.apache.spark.sql.SparkSession

/** Where the DRIVER time of a query goes before any task runs:
  * DataFrame construction (the query-builder fold itself), Catalyst
  * phases from the QueryPlanningTracker (analysis / optimization /
  * physical planning), and the residual execution wall. Multi-job
  * queries on this board spend ~half their sf0.1 wall between jobs
  * (JobProbe r15), and this splits that gap into its named parts so a
  * planning-cost fix can be attributed, not guessed. */
object PlanPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = (if (args.length > 1) args(1)
      else "q_pack_recipe,q_curation_pipeline").split(",").map(_.trim)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names.filter(_.nonEmpty)) {
      val fn = graft.SparkEntry.queries(n)
      fn(spark, dir).count() // warm: JIT, codegen cache, file listing
      spark.catalog.clearCache()
      Thread.sleep(200)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      // force analysis+optimization+physical planning without running
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      val phases = df.queryExecution.tracker.phases.map { case (p, s) =>
        f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.3fs" }.mkString(" ")
      val t3 = System.nanoTime()
      df.count()
      val t4 = System.nanoTime()
      println(f"$n%-24s construct=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f " +
        f"exec=${(t4 - t3) / 1e9}%.3f  [$phases]")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
