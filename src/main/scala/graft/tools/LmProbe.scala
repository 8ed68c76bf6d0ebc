package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueriesCommon

/** Cumulative phase split for q_lm_score at scale (round 10: it pinned
  * at 2.30× interleaved, the last >2× data-cost member after the
  * spines and BM25). Phases: bigram extraction (map-only), + the w1
  * exchange, + both count windows, + the vocab scalar, vs the full
  * query — the first arm that ≈ the full wall is the cost center.
  *
  * Usage: runMain graft.tools.LmProbe <dir> [passes]
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata15")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val agg = new Object {
      var cpuMs = 0L; var shufW = 0L; var recs = 0L
      def reset(): Unit = { cpuMs = 0; shufW = 0; recs = 0 }
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          agg.cpuMs += m.executorCpuTime / 1000000
          agg.shufW += m.shuffleWriteMetrics.bytesWritten
          agg.recs += m.shuffleWriteMetrics.recordsWritten
        }
      }
    })
    def timed(label: String)(act: => Unit): Unit =
      for (_ <- 1 to passes) {
        agg.synchronized(agg.reset())
        val t0 = System.nanoTime()
        act
        println(f"$label%-12s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          f"cpu=${agg.cpuMs / 1000}%4ds shufW=${agg.shufW / 1e9}%.2f GB " +
          f"recs=${agg.recs / 1000000}%dM")
      }

    val toksArr = "filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')"
    val docs = QueriesCommon.fannedTable(spark, dir, "documents")
    val bigrams = docs.select(col("doc_id"),
      expr(QueriesCommon.bigramsSqlFor("text")).as("bg"))
      .select(col("doc_id"), explode(col("bg")).as("p"))
      .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"))

    timed("bigrams") { bigrams.count() }
    val rep = bigrams.repartition(col("w1"))
    timed("+exchange") { rep.count() }
    val cBg = Window.partitionBy("w1", "w2")
    val cHist = Window.partitionBy("w1")
    timed("+windows") {
      rep.withColumn("c12", count(lit(1)).over(cBg))
        .withColumn("c1", count(lit(1)).over(cHist)).count()
    }
    timed("vocab") {
      QueriesCommon.table(spark, dir, "documents")
        .select(explode(expr(s"transform($toksArr, x -> xxhash64(x))")).as("tok"))
        .agg(countDistinct("tok")).collect()
    }
    timed("distinct-bg") {
      rep.groupBy("w1", "w2").agg(count(lit(1))).count()
    }
    timed("full") {
      graft.SparkEntry.queries("q_lm_score")(spark, dir).count()
    }
    spark.stop()
  }
}
