package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe: sort-merge vs shuffled-hash join preference on the
  * at-scale q_join_agg spine (round 7). At 15.7 GiB the SMJ's sorts
  * spill in one JVM (116 s vs DuckDB's shared-memory hash join at
  * 7.9 s — BASELINE §e); Spark's own hash-join answer is
  * `spark.sql.join.preferSortMergeJoin=false`, which lets the planner
  * pick ShuffledHashJoin when a side's per-partition build fits — no
  * sort on either side. The probe times the full q_join_agg at both
  * settings in ONE session (alternating, min of 2 each) so the
  * decision is measured, not guessed; build-side OOM risk is the
  * caveat the writeup must carry (SMJ degrades by spilling, SHJ by
  * failing), which is why adoption is a size-gated conf, not a
  * default.
  *
  * Usage: runMain graft.tools.ShjProbe <dir> [query]
  */
object ShjProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata15")
    val qname = args.lift(1).getOrElse("q_join_agg")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(preferSmj: Boolean): Double = {
      // branch-session override (round 8 fork scoping)
      System.setProperty(
        "graft.branch.spark.sql.join.preferSortMergeJoin", preferSmj.toString)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(qname)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up once (codegen, file listing)
    run(preferSmj = true)
    val times = collection.mutable.Map[Boolean, Double]()
    for (pass <- 1 to 2; smj <- Seq(true, false)) {
      val t = run(smj)
      times(smj) = math.min(times.getOrElse(smj, t), t)
      println(f"pass $pass preferSortMergeJoin=$smj%-5s $qname ${t}%8.2f s")
    }
    println(f"# min-of-2: SMJ=${times(true)}%.2f s SHJ=${times(false)}%.2f s " +
      f"(${times(true) / times(false)}%.2fx)")
    spark.stop()
  }
}
