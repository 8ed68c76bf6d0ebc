package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-11 ask #2: test the bucket-TAIL claim with real executor
  * JVMs. Round 10 proved q_semi_idlist's bucketed zipper reaches CPU
  * parity with DuckDB-32 (~95 s executor CPU vs 2.88 s × 32 —
  * `semifloor_r10.txt`) while its WALL stays ~2.5× — and attributed
  * the gap to single-JVM scheduling: 32 bucket tasks time-share one
  * JVM's scheduler/allocator/JIT, so the effective parallelism is ~13
  * cores. The claim "a cluster runs one bucket per core with no
  * shared-scheduler tail" was an argument, not a measurement.
  *
  * This probe runs the SAME two bucketed spines on the SAME data under
  * `local-cluster[n,cores,mem]` — Spark's standalone-in-a-box: an
  * in-JVM master/worker pair that forks REAL separate
  * CoarseGrainedExecutorBackend JVMs, the closest in-sandbox analogue
  * to a multi-executor cluster. Same min-of-N methodology as every
  * at-scale number; per-pass executor CPU from stage metrics so the
  * wall/CPU ratio (effective cores) is read directly.
  *
  * Usage: SPARK_HOME=/opt/spark tools/run_main.sh
  *   graft.tools.ClusterTailProbe <dir> <master> [passes] [execMem]
  * e.g. master = local-cluster[4,8,8192] | local[32]
  */
object ClusterTailProbe {
  private final class CpuAgg {
    private var cpuMs = 0L
    private var gcMs = 0L
    private var runMs = 0L
    def reset(): Unit = synchronized { cpuMs = 0; gcMs = 0; runMs = 0 }
    def add(cpu: Long, gc: Long, run: Long): Unit = synchronized {
      cpuMs += cpu; gcMs += gc; runMs += run
    }
    def seconds: Double = synchronized { cpuMs / 1000.0 }
    def gcSeconds: Double = synchronized { gcMs / 1000.0 }
    def runSeconds: Double = synchronized { runMs / 1000.0 }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata15")
    val master = args.lift(1).getOrElse("local-cluster[4,8,8192]")
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val execMem = args.lift(3).getOrElse("7g")
    // the forked executor JVMs need the same module opens and the
    // graft classes the driver runs with
    val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar")
      .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.memory", execMem)
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.executor.extraJavaOptions", opens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val agg = new CpuAgg
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null)
          agg.add(m.executorCpuTime / 1000000, m.jvmGCTime, m.executorRunTime)
      }
    })
    // per-stage task-duration skew: where does the wall hide when the
    // slots are idle? (critical path ≈ Σ per-stage max; tail ratio =
    // max/avg task duration within the stage)
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val verbose = sys.env.get("GRAFT_TAIL_VERBOSE").contains("1")
    if (verbose) spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        stageTasks.computeIfAbsent(e.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(e.taskInfo.duration)
      }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val span = for {
          sub <- i.submissionTime; done <- i.completionTime
        } yield f"span=${(done - sub) / 1000.0}%5.2f s sub@${sub % 1000000}"
        stageNames.put(i.stageId,
          span.getOrElse("") + " " + i.name.take(50))
      }
    })
    def dumpStages(): Unit = if (verbose) {
      import scala.jdk.CollectionConverters._
      val rows = stageTasks.asScala.toSeq.sortBy(_._1)
      for ((sid, q) <- rows if q.size > 0) {
        val ds = q.asScala.toSeq.map(_.toDouble / 1000)
        val mx = ds.max; val av = ds.sum / ds.size
        if (mx > 0.05)
          println(f"  stage $sid%4d tasks=${ds.size}%4d " +
            f"avg=$av%6.2f s max=$mx%6.2f s " +
            f"tail=${mx / math.max(av, 1e-9)}%4.1fx " +
            stageNames.getOrDefault(sid, ""))
      }
      stageTasks.clear(); stageNames.clear()
    }

    println(s"# master=$master execMem=$execMem dir=$dir passes=$passes")
    // query set overridable: GRAFT_TAIL_QUERIES=q_a,q_b (round 12 runs
    // the EXCEPT/INTERSECT pair through the same histogram)
    val queryList = sys.env.get("GRAFT_TAIL_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("q_semi_idlist", "q_join_agg", "q_anti_missing"))
    for (q <- queryList) {
      var best = Double.MaxValue
      for (pass <- 1 to passes) {
        agg.reset()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = agg.seconds
        val eff = cpu / wall
        best = math.min(best, wall)
        // run − cpu = task time OFF-CPU (IO waits, scheduler, lock
        // contention); gc is the JVM's own share of the stall story
        println(f"$q%-16s pass$pass wall=$wall%6.2f s cpu=$cpu%6.1f s " +
          f"gc=${agg.gcSeconds}%5.1f s run=${agg.runSeconds}%6.1f s " +
          f"effCores=$eff%5.1f")
        dumpStages()
      }
      println(f"$q%-16s MIN    wall=$best%6.2f s")
    }
    spark.stop()
  }
}
