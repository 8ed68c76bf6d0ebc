package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10: what remains of q_semi_idlist at 15.7 GiB after the
  * bucketed zipper route (interleaved 2.58× vs DuckDB, down from
  * 5.3×)? The plan has ZERO join-key exchanges, so the residue must be
  * scan + zipper + aggregate. This probe splits them cumulatively over
  * the SAME bucketed layout the shipped query reads:
  *
  *  - `scan:fact` — the lineitem spine columns alone (decode floor);
  *  - `scan:both` — + the urgent-orders probe side;
  *  - `full` — the shipped q_semi_idlist (zipper + agg on top).
  *
  * If `scan:both` ≈ `full`, the gap to DuckDB is columnar scan
  * throughput in one JVM — layout-identical work, no plan debt.
  *
  * Usage: runMain graft.tools.SemiFloorProbe <dir> [passes]
  */
object SemiFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata15")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val agg = new Object {
      var cpuMs = 0L; var shufW = 0L; var spill = 0L
      def reset(): Unit = { cpuMs = 0; shufW = 0; spill = 0 }
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          agg.cpuMs += m.executorCpuTime / 1000000
          agg.shufW += m.shuffleWriteMetrics.bytesWritten
          agg.spill += m.diskBytesSpilled
        }
      }
    })
    def timed(label: String)(act: => Unit): Unit =
      for (_ <- 1 to passes) {
        agg.synchronized(agg.reset())
        val t0 = System.nanoTime()
        act
        println(f"$label%-10s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          f"cpu=${agg.cpuMs / 1000}%4ds shufW=${agg.shufW / 1e9}%.2f GB " +
          f"spill=${agg.spill / 1e9}%.2f GB")
      }

    // the same bucketed layout the shipped route reads
    val li = graft.ops.Scale.readBucketedDir(spark, s"$dir/_bucketed/lineitem")
      .getOrElse(sys.error(s"no bucketed layout under $dir — run BucketIngest"))
      .select("l_orderkey", "l_returnflag", "l_quantity")
    val o = graft.ops.Scale.readBucketedDir(spark, s"$dir/_bucketed/orders")
      .get.select("o_orderkey", "o_orderpriority")

    // count(col) forces actual column decode (a bare count(*) would
    // be answered from row-group metadata without touching the pages)
    timed("scan:fact") {
      li.agg(count(col("l_returnflag")), sum(col("l_quantity")),
        sum(col("l_orderkey"))).collect()
    }
    timed("scan:both") {
      li.agg(count(col("l_returnflag")), sum(col("l_quantity")),
        sum(col("l_orderkey"))).collect()
      o.filter(col("o_orderpriority") === "1-URGENT")
        .agg(count(col("o_orderkey"))).collect()
    }
    timed("full") {
      graft.SparkEntry.queries("q_semi_idlist")(spark, dir).count()
    }
    spark.stop()
  }
}
