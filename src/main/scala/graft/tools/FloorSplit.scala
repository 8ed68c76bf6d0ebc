package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits the sub-second-query floor into its two halves: driver plan
  * work (analysis + optimization + physical planning + codegen, forced
  * via `executedPlan`) vs actual execution (count on the pre-planned
  * frame). Decides whether the next floor fix is a plan cache or an
  * execution change. */
object FloorSplit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_semi_idlist", "q_join_agg", "q_range_join", "q_sessionize",
        "q_neardup_exact")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.queryExecution.executedPlan // force full planning
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val plan = samples.map(_._1).min
      val exec = samples.map(_._2).min
      println(f"$name%-18s plan=$plan%.3f s  exec=$exec%.3f s")
    }
    spark.stop()
  }
}
