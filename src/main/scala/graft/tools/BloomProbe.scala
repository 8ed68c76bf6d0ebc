package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B of Catalyst's runtime bloom-filter injection
  * (InjectRuntimeFilter) on the at-scale branch: at real cluster scale
  * (application side > 10 GB) Spark injects a bloom filter from the
  * selective build side of a shuffle join automatically; at the 1.4 GiB
  * test point the default applicationSideScanSizeThreshold keeps it
  * off. This probe lowers the thresholds so the injected plan can be
  * measured at the scale we CAN run, answering "what will the shuffle
  * look like at 100 TB" with a measurement instead of a guess.
  *
  * Usage: tools/run_main.sh graft.tools.BloomProbe [dir] [q1,q2,...]
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q_semi_idlist", "q_anti_missing", "q_join_agg"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(n: Int)(body: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    for (mode <- Seq("default", "bloom")) {
      // branch-session overrides (round 8 fork scoping): the at-scale
      // branch now widens the bloom gates ITSELF, so the "default" arm
      // must pin Spark's defaults explicitly to stay a true A/B
      val (app, create) =
        if (mode == "bloom") ("256MB", "64MB") else ("10GB", "10MB")
      System.setProperty("graft.branch.spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", app)
      System.setProperty("graft.branch.spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", create)
      for (name <- names) {
        val fn = graft.SparkEntry.queries(name)
        fn(spark, dir).count() // warm (compiles the mode's plan)
        val sec = timed(2) { fn(spark, dir).count() }
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val injected = plan.contains("bloom_filter") ||
          plan.toLowerCase.contains("mightcontain") ||
          plan.toLowerCase.contains("might_contain")
        println(f"$mode%-8s $name%-18s $sec%6.2f s  bloom_injected=$injected")
      }
    }
    spark.stop()
  }
}
