package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

/** Concurrent-workload bench (round 8): a real pipeline runs MANY
  * queries on one session at once, while every bench number so far is
  * one-query-at-a-time. Now that the at-scale branch is scoped to
  * forked sessions (no shared-conf races), this probe runs a mixed
  * 8-query batch (a) serially (sum of per-query walls) and (b)
  * concurrently on one SparkSession (8 threads, one action each;
  * Spark's FAIR-enough FIFO scheduler interleaves stages), both
  * min-of-2, and reports the aggregate speed-up. Expected on
  * local[32]: the concurrent wall lands well under the serial sum —
  * single queries leave cores idle between stages (the ~0.08 s/job
  * floor the bench writeups track), and concurrency fills those gaps.
  *
  * Usage: runMain graft.tools.ConcurrentBenchProbe [sfDir] [passes]
  */
object ConcurrentBenchProbe {
  private val Mixed = Seq(
    "q_join_agg", "q1_agg", "q_bm25", "q_minhash_oracle",
    "q_semi_idlist", "q_topk_per_group", "q_lang_id", "q_window_hourly")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, dir).count()

    // warm-up: plans, codegen, file listing
    Mixed.foreach(run)

    def serialSum(): Double = Mixed.map { n =>
      val t0 = System.nanoTime(); run(n); (System.nanoTime() - t0) / 1e9
    }.sum

    def concurrentWall(): Double = {
      val pool = Executors.newFixedThreadPool(Mixed.size)
      val start = new java.util.concurrent.CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      Mixed.foreach { n =>
        val task: Runnable = () =>
          try {
            start.await()
            graft.SparkEntry.queries(n)(spark, dir).count()
            ()
          } catch { case e: Throwable => errs.add(e) }
        pool.submit(task)
      }
      val t0 = System.nanoTime()
      start.countDown()
      pool.shutdown()
      require(pool.awaitTermination(600, TimeUnit.SECONDS), "pool timeout")
      require(errs.isEmpty, s"concurrent query failed: ${errs.peek()}")
      (System.nanoTime() - t0) / 1e9
    }

    var bestSerial = Double.MaxValue
    var bestConc = Double.MaxValue
    for (p <- 1 to passes) {
      val s = serialSum()
      val c = concurrentWall()
      bestSerial = math.min(bestSerial, s)
      bestConc = math.min(bestConc, c)
      println(f"pass $p serialSum=$s%.2f s concurrentWall=$c%.2f s")
    }
    println(f"# ${Mixed.size} mixed queries on ONE session, $dir, min of $passes:")
    println(f"# serial sum ${bestSerial}%.2f s vs concurrent wall ${bestConc}%.2f s " +
      f"= ${bestSerial / bestConc}%.2fx aggregate speed-up")

    // Optional second dir: cross-REGIME concurrency — at-scale queries
    // (AQE on, SHJ preference) racing sub-threshold ones (AQE off) on
    // the same root session. The r8 QueriesCommonSpec isolation
    // assertion, re-run at real scale: each frame must hold its own
    // branch's confs for the entire concurrent window.
    args.lift(2).foreach { dir2 =>
      val big = graft.QueriesCommon.table(spark, dir, "lineitem")
      val small = graft.QueriesCommon.table(spark, dir2, "lineitem")
      val wantBig = big.sparkSession.conf.get("spark.sql.adaptive.enabled")
      val wantSmall = small.sparkSession.conf.get("spark.sql.adaptive.enabled")
      require(big.sparkSession ne small.sparkSession,
        "regimes must fork distinct branch sessions")
      println(s"# cross-regime: $dir AQE=$wantBig | $dir2 AQE=$wantSmall")
      val pool = Executors.newFixedThreadPool(8)
      val start = new java.util.concurrent.CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val half = Mixed.size / 2
      (Mixed.take(half).map(_ -> dir) ++
        Mixed.drop(half).map(_ -> dir2)).foreach { case (n, d) =>
        val task: Runnable = () =>
          try {
            start.await()
            val df = graft.SparkEntry.queries(n)(spark, d)
            df.count()
            val want = if (d == dir) wantBig else wantSmall
            val got = df.sparkSession.conf.get("spark.sql.adaptive.enabled")
            require(got == want,
              s"$n@$d saw adaptive=$got, branch promised $want")
            ()
          } catch { case e: Throwable => errs.add(e) }
        pool.submit(task)
      }
      val t0 = System.nanoTime()
      start.countDown()
      pool.shutdown()
      require(pool.awaitTermination(900, TimeUnit.SECONDS), "pool timeout")
      require(errs.isEmpty, s"cross-regime query failed: ${errs.peek()}")
      println(f"# cross-regime concurrent wall " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s — per-branch confs held " +
        f"for all ${Mixed.size} queries")
    }
    spark.stop()
  }
}
