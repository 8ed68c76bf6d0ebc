package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Where does the sub-second-query floor go? Runs the named queries
  * min-of-3 with AQE on vs off and reports times + Spark job counts:
  * AQE materializes each exchange as its own job (a scheduling
  * barrier), which is pure overhead when the whole plan is already
  * right at this scale. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_semi_idlist", "q_join_agg", "q_sessionize", "q_range_join",
        "q_neardup_exact")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    for (aqe <- Seq(true, false); name <- names) {
      // branch-session override: the fork scoping (round 8) means the
      // probe's own session conf never reaches a query's plan
      System.setProperty("graft.branch.spark.sql.adaptive.enabled", aqe.toString)
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      val times = (1 to 3).map { _ =>
        Thread.sleep(100); jobs.set(0)
        val t0 = System.nanoTime(); fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100); (dt, jobs.get())
      }
      val best = times.minBy(_._1)
      println(f"aqe=$aqe%-5s $name%-18s min=${best._1}%.3f s  jobs=${times.map(_._2).max}")
    }
    spark.stop()
  }
}
