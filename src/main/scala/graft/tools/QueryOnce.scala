package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one named SparkEntry query: one warm pass (plan compile +
  * buffer cache, the same treatment tools/duck_bench.py gives DuckDB),
  * then one timed pass, printed as a single machine-greppable line.
  * Exists for INTERLEAVED cross-engine windows: a driver script
  * alternates this with the DuckDB oracle run so host-contention
  * bursts (documented 3.5x CPU swings on this box) hit both engines
  * in the same window instead of whichever engine ran second.
  *
  * Usage: tools/run_main.sh graft.tools.QueryOnce <dir> <name> [timedPasses]
  */
object QueryOnce {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val passes = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warm
    // SPARK_GRAFT_PLAN=1: print the POST-EXECUTION plan (AQE final)
    // after the warm pass, for at-scale plan assertions — e.g. that a
    // bucketed-layout route really carries zero join-key exchanges
    // under the very confs the bench runs with
    if (sys.env.get("SPARK_GRAFT_PLAN").contains("1")) {
      val df = fn(spark, dir)
      df.count()
      println(s"== executed plan: $name ==")
      println(df.queryExecution.executedPlan.toString)
    }
    for (p <- 1 to passes) {
      // drop any persisted relation the warm (or previous) pass
      // registered — the curation pipeline's dedup barrier: the
      // CacheManager rewrites logically-equal subtrees to read the
      // cache, and a timed pass must re-pay the corpus pass its
      // DuckDB twin re-pays (same rule as graft.Bench)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"GRAFT $name pass$p ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
