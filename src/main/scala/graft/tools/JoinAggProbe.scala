package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueriesCommon

/** Round-9 ask #1: where do q_join_agg's seconds go at 15.7 GiB, and
  * which lever closes the gap to DuckDB's shared-memory hash join?
  *
  * Measures, per variant, the stage-level totals that distinguish
  * "irreducible exchange cost" from "spill / partition-sizing debt":
  * shuffle bytes written+read, records shuffled, memory/disk spill,
  * summed executor CPU vs wall. Variants:
  *
  *  - `spine`: the shipped shape — lineitem(504M) ⋈ orders(126M) on
  *    orderkey, dims broadcast, then group by n_name;
  *  - `preagg`: partial-aggregate lineitem BY ORDERKEY first
  *    (SUM/COUNT over DECIMAL are reassociable exactly), so the
  *    exchange carries one row per order (~126M) instead of one per
  *    line item (~504M), and the join is 126M ⋈ 126M. Map-side combine
  *    does the 4:1 reduction before a byte is written: lineitem rows
  *    for one order are adjacent in generation order, so the partial
  *    hash agg absorbs them within each input split. Catalyst cannot
  *    push an aggregate through a join on its own — this is the
  *    rewrite the engine adopts if the numbers say so.
  *
  * Each variant runs under shuffle-partition counts {32, 64, 128} and
  * join preference SMJ/SHJ via the `graft.branch.*` fork overrides
  * (QueriesCommon round 8: conf flips on the probe's own session are
  * shadowed by the branch fork).
  *
  * Usage: runMain graft.tools.JoinAggProbe <dir> [passes]
  */
object JoinAggProbe {

  def spine(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.queries("q_join_agg")(s, dir)

  /** The pre-aggregated shape: same semantics, one row per order on
    * the exchange. Decimal partial sums keep bit-exactness (the final
    * CAST to DOUBLE sees the identical decimal total). */
  def preagg(s: SparkSession, dir: String): DataFrame = {
    val li = QueriesCommon.table(s, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = QueriesCommon.table(s, dir, "orders").select("o_orderkey", "o_custkey")
    val c = QueriesCommon.table(s, dir, "customer").select("c_custkey", "c_nationkey")
    val n = QueriesCommon.table(s, dir, "nation").select("n_nationkey", "n_name")
    val liAgg = li.groupBy("l_orderkey").agg(
      expr("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))").as("rev_d"),
      count(lit(1)).as("cnt"))
    val oN = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("o_orderkey"), col("n_name"))
    liAgg.join(oN, liAgg("l_orderkey") === oN("o_orderkey"))
      .groupBy("n_name")
      .agg(expr("CAST(SUM(rev_d) AS DOUBLE)").as("revenue"),
        sum(col("cnt")).as("n_items"))
      .orderBy("n_name")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata15")
    val passes = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stage-metric totals for the jobs of one run
    val agg = new Object {
      var shufWrite = 0L; var shufRead = 0L; var recsWritten = 0L
      var memSpill = 0L; var diskSpill = 0L; var cpuMs = 0L; var runMs = 0L
      def reset(): Unit = { shufWrite = 0; shufRead = 0; recsWritten = 0
        memSpill = 0; diskSpill = 0; cpuMs = 0; runMs = 0 }
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          agg.shufWrite += m.shuffleWriteMetrics.bytesWritten
          agg.recsWritten += m.shuffleWriteMetrics.recordsWritten
          agg.shufRead += m.shuffleReadMetrics.totalBytesRead
          agg.memSpill += m.memoryBytesSpilled
          agg.diskSpill += m.diskBytesSpilled
          agg.cpuMs += m.executorCpuTime / 1000000
          agg.runMs += m.executorRunTime
        }
      }
    })

    val variants: Seq[(String, (SparkSession, String) => DataFrame)] =
      Seq("spine" -> (spine(_, _)), "preagg" -> (preagg(_, _)))

    def run(label: String, fn: (SparkSession, String) => DataFrame,
        parts: Int, smj: Boolean): Unit = {
      System.setProperty("graft.branch.spark.sql.shuffle.partitions",
        parts.toString)
      System.setProperty("graft.branch.spark.sql.join.preferSortMergeJoin",
        smj.toString)
      var best = Double.MaxValue
      for (_ <- 1 to passes) {
        agg.synchronized(agg.reset())
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        best = math.min(best, t)
        val gb = (x: Long) => f"${x / 1e9}%.2f"
        println(f"$label%-7s parts=$parts%-4d ${if (smj) "SMJ" else "SHJ"} " +
          f"wall=${t}%7.2f s  shufW=${gb(agg.shufWrite)} GB " +
          f"shufR=${gb(agg.shufRead)} GB recs=${agg.recsWritten / 1000000}%dM " +
          f"spillMem=${gb(agg.memSpill)} GB spillDisk=${gb(agg.diskSpill)} GB " +
          f"cpu=${agg.cpuMs / 1000}%ds run=${agg.runMs / 1000}%ds")
      }
    }

    // correctness first: both shapes agree at this scale
    val a = spine(spark, dir).collect().map(_.toString).toSeq
    val b = preagg(spark, dir).collect().map(_.toString).toSeq
    require(a == b, s"preagg rewrite diverged:\n${a.mkString("\n")}\nvs\n${b.mkString("\n")}")
    println(s"# shapes agree: ${a.size} rows identical at $dir")

    for {
      (label, fn) <- variants
      parts <- Seq(32, 64, 128)
      smj <- Seq(true, false)
    } run(label, fn, parts, smj)

    spark.stop()
  }
}
