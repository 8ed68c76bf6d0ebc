package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** At-scale probe for greedy farthest-point selection
  * (`similarity/Coreset`): synthesizes n clustered vectors (the
  * KmeansProbe corpus — k planted spikes + deterministic noise), runs
  * a k-pick selection, and reports
  *
  *   - per-pick wall (each pick = one map-only maxscore update + one
  *     TakeOrdered(1) argmax over the persisted frame),
  *   - total exchanges across the WHOLE selection (asserted 0 — the
  *     scaladoc claim: no shuffle anywhere, only scans + collects),
  *   - coverage: the planted spike dimension of every pick (greedy
  *     k-center on k well-separated clusters must hit all k),
  *   - the final covering radius² vs the planted intra-cluster spread.
  *
  * Usage: tools/run_main.sh graft.tools.CoresetProbe [n] [dims] [k]
  * (defaults 2,000,000 × 64, k=32).
  */
object CoresetProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dims = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vecs = spark.range(n)
      .select(col("id").as("vec_id"),
        expr(s"""transform(sequence(1, $dims), j ->
          cast(CASE WHEN j - 1 = pmod(id, $k) % $dims THEN 20.0 ELSE 0.0 END
               + pmod(id * j, 997) / 2000.0 AS float))""").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()

    // total exchanges across every job the selection runs, from the
    // ground truth: executor-side shuffle-write metrics
    val sc = spark.sparkContext
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0L)
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffled.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val t0 = System.nanoTime()
    val picks = graft.similarity.Coreset.select(vecs, "vec_id", "embedding", k)
    val tSel = (System.nanoTime() - t0) / 1e9
    println(f"select(k=$k) over $n x $dims: $tSel%.1f s " +
      f"(${tSel / k}%.2f s/pick; each pick = one map-only update + one argmax)")

    // the SELECTION must be shuffle-free (TakeOrdered argmaxes + map-only
    // updates); snapshot before radiusSq, whose global max agg legit
    // merges one row per partition through a single tiny exchange.
    // (listener events are async — wait until the counter is stable)
    def settle(): Long = {
      var last = -1L
      var v = shuffled.get()
      var spins = 0
      while (v != last && spins < 50) {
        last = v; Thread.sleep(100); v = shuffled.get(); spins += 1
      }
      v
    }
    val selShuffle = settle()
    println(s"total shuffle bytes written across the selection: $selShuffle")
    require(selShuffle == 0L,
      s"selection must be shuffle-free, wrote $selShuffle shuffle bytes")

    val r2 = graft.similarity.Coreset.radiusSq(vecs, "vec_id", "embedding", picks)
    // every pick sits in a distinct planted cluster (spike dim = id % k)
    val clusters = picks.map(_.id.asInstanceOf[Long] % k).toSet
    println(s"coverage: ${clusters.size} distinct planted clusters of $k; " +
      f"covering radius² $r2%.3f (intra-cluster noise scale ~${dims * 0.25}%.1f, " +
      "inter-cluster 800)")
    require(clusters.size == k, s"missed clusters: picked only ${clusters.size}")
    require(r2 < 2 * 20.0 * 20.0, s"radius² $r2 is inter-cluster scale")
    spark.stop()
  }
}
