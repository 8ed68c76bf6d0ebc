package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** At-scale skew + spill probe (round 7): manufacture a HOT join key
  * on the big replicated fact table (hotPct% of ALL lineitem rows
  * collapsed onto orderkey −1), join it against orders (plus the one
  * matching −1 row), and measure:
  *
  *  1. whether AQE's skew-join optimization SPLITS the hot partition
  *     at its DEFAULT thresholds (`OptimizeSkewedJoin`: partition >
  *     256 MB and > 5× median) — the mechanism that saves a
  *     1000-executor cluster from one straggler task. The split shows
  *     up in the final adaptive plan as a skew-marked SMJ and a
  *     multiplied partition count;
  *  2. the same join with skew handling disabled — the straggler
  *     baseline a fixed partitioning would suffer;
  *  3. total spill (memory + disk) across tasks via TaskEnd metrics —
  *     evidence the sort path degrades to disk instead of OOM when
  *     the hot partition outgrows execution memory.
  *
  * The dimension side is orders AS-IS plus one synthetic −1 row, so
  * the join output stays ≈ |lineitem| (skew on ONE side only — a
  * both-sides hot key would be a quadratic blowup, which no skew
  * handler fixes and none should be asked to).
  *
  * Usage: runMain graft.tools.SkewSpillProbe <bigdataDir> [hotPct]
  */
object SkewSpillProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata")
    val hotPct = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val spillMem = new AtomicLong(0)
    val spillDisk = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    def spillSnapshot(): (Long, Long) = (spillMem.get, spillDisk.get)

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        when(graft.ops.Mixture.bucket("l_orderkey") <
            lit(hotPct * 256 / 100), lit(-1L))
          .otherwise(col("l_orderkey")).as("k"),
        col("l_quantity"), col("l_extendedprice"))
    val ords = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
      .unionByName(Seq((-1L, 0.0)).toDF("k", "o_totalprice"))

    // optional threshold override (3rd arg, MB) for sub-15-GiB dry
    // runs; the at-scale run keeps Spark's 256 MB default
    args.lift(2).foreach { mb =>
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        s"${mb}m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        s"${mb}m")
    }

    def runJoin(skewJoin: Boolean): (Double, Boolean, Long, Long) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      // keep the SMJ: a broadcast dim would dodge the skew entirely
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // downstream agg is GLOBAL, not keyed on k: a k-keyed agg could
      // reuse the join's hash partitioning, and AQE (correctly)
      // refuses to skew-split a join whose output partitioning a
      // downstream exchange-free agg depends on
      val joined = li.hint("merge").join(ords, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val (m0, d0) = spillSnapshot()
      val t0 = System.nanoTime()
      val qe = joined.queryExecution
      qe.executedPlan.execute().foreachPartition(
        (_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
      val secs = (System.nanoTime() - t0) / 1e9
      val (m1, d1) = spillSnapshot()
      val plan = qe.executedPlan.toString
      val skewMarked = plan.toLowerCase.contains("skew=true") ||
        plan.toLowerCase.contains("skewed")
      if (skewJoin) java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/skewprobe_plan.txt"), plan)
      (secs, skewMarked, m1 - m0, d1 - d0)
    }

    println(s"# SkewSpillProbe dir=$dir hotPct=$hotPct% rows=${li.count()}")
    val (tOff, _, mOff, dOff) = runJoin(skewJoin = false)
    println(f"skewJoin=OFF wall=$tOff%8.2f s  " +
      f"spill mem=${mOff / 1e9}%.2f GB disk=${dOff / 1e9}%.2f GB")
    val (tOn, marked, mOn, dOn) = runJoin(skewJoin = true)
    println(f"skewJoin=ON  wall=$tOn%8.2f s  " +
      f"spill mem=${mOn / 1e9}%.2f GB disk=${dOn / 1e9}%.2f GB  " +
      s"skew-split in final plan: $marked")
    spark.stop()
  }
}
