package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Evidence dump for the AT-SCALE branch of the size-gated cost model:
  * run headline queries against a ≥1 GiB directory (tools/BigGen
  * output), EXECUTE them, and print the FINAL adaptive plan
  * (`AdaptiveSparkPlan isFinalPlan=true`) — the only artifact that
  * shows what AQE actually did at runtime (AQEShuffleRead coalescing,
  * skew splits, broadcast conversions), as opposed to the static
  * EXPLAIN which shows only what it might do. Output →
  * target/aqe_plans.txt (snippets land in BASELINE.md §e). */
object AqeDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("q_join_agg", "q1_agg", "q_semi_idlist", "q_topk_per_group",
        "q_minhash_lsh", "q_bm25")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append(s"# Final adaptive plans at $dir\n")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      // execute the plan ITSELF (not a derived count() plan) so the
      // AdaptiveSparkPlanExec node finalizes and toString shows the
      // runtime-chosen stages
      qe.executedPlan.execute().foreachPartition(
        (_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
      val secs = (System.nanoTime() - t0) / 1e9
      sb.append(f"\n## $n  (${secs}%.2f s)\n\n")
      sb.append(qe.executedPlan.toString).append("\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/aqe_plans.txt"), sb.toString)
    println(s"wrote target/aqe_plans.txt (${names.size} plans)")
    spark.stop()
  }
}
