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

    val modes = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("default", "bloom"))
    for (mode <- modes) {
      // branch-session overrides (round 8 fork scoping): the at-scale
      // branch now widens the bloom gates ITSELF, so the "default" arm
      // must pin Spark's defaults explicitly to stay a true A/B.
      // "bloom15" (round 9): the r8 gates stopped firing at 15.7 GiB —
      // the urgent-orders probe side grows with the fact table and
      // crossed the 64 MB creation gate — AND Spark's default bloom
      // sizing (maxNumItems 4M, maxNumBits 8 MB) would make a ~31M-key
      // filter useless even if admitted (fpp → 1). The scaled mode
      // admits creation sides up to 1 GB and sizes the bloom for the
      // keys it will actually hold.
      // "bloom15m" (round 9): the exactly-sized 80 MB bloom measured
      // SLOWER than no bloom at 15.7 GiB (every might_contain probe on
      // 504M fact rows is a DRAM miss in a filter 8x larger than L3).
      // This arm caps the filter at 16 MB (L3-resident on this box):
      // ~25M urgent keys at 5.4 bits/key give fpp~0.13, so the filter
      // still prunes ~70% of the fact shuffle while probes stay
      // cache-hot — testing whether a deliberately lossy-but-resident
      // bloom beats both the exact one and none at all.
      val (app, create, items, bits) = mode match {
        case "bloom" => ("256MB", "64MB", "4000000", "67108864")
        case "bloom15" => ("256MB", "1GB", "64000000", "671088640")
        case "bloom15m" => ("256MB", "1GB", "64000000", "134217728")
        case _ => ("10GB", "10MB", "4000000", "67108864")
      }
      System.setProperty("graft.branch.spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", app)
      System.setProperty("graft.branch.spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", create)
      System.setProperty("graft.branch.spark.sql.optimizer.runtime.bloomFilter.maxNumItems", items)
      System.setProperty("graft.branch.spark.sql.optimizer.runtime.bloomFilter.maxNumBits", bits)
      // the expected*/numBits pair is what Spark falls back to when the
      // creation side carries no row estimate — keep it consistent with
      // the caps so a stats-less plan doesn't get a 1M-key bloom
      System.setProperty("graft.branch.spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
        if (mode.startsWith("bloom15")) "64000000" else "1000000")
      System.setProperty("graft.branch.spark.sql.optimizer.runtime.bloomFilter.numBits",
        if (mode == "bloom15") "671088640"
        else if (mode == "bloom15m") "134217728" else "8388608")
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
