package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.Curation

/** The composed-vs-staged evidence run for the curation pipeline
  * (round-13 ask #1): run the honest N-job chain — each stage reads
  * its predecessor's MATERIALIZED parquet output, computes one stage,
  * and writes its own — then the composed one-dataflow form, and
  * report per-stage rows in/out, per-stage wall, and the plan costs
  * that composition actually saves: corpus scans, exchanges, and the
  * intermediate write/read round trips.
  *
  * The first cut of this bench re-ran each stage PREFIX from the
  * source instead (stage k re-paying stages 1..k−1), which
  * quadratically double-counts the early stages — ~21 stage
  * executions instead of 6 — and inflates the staged total; the r13
  * self-review caught it. A real chain of N spark-submit jobs pays
  * each stage once plus the materialization boundary, which is what
  * this measures now.
  *
  * Usage: tools/run_main.sh graft.tools.CurationBench <dir> [passes]
  * Appends nothing; prints a block suitable for docs/artifacts.
  */
object CurationBench {
  /** Structural plan costs: distinct-by-identity scan and exchange
    * NODES, walking through AQE query stages and into each cached
    * relation's plan exactly once — a string count would re-count the
    * cached plan per InMemoryRelation mention and miss reuse. */
  final case class PlanCosts(scans: Int, exchanges: Int, reused: Int)
  private def costs(df: org.apache.spark.sql.DataFrame): PlanCosts = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange._
    val ident = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    var scans, ex, reused = 0
    def walk(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case i: InMemoryTableScanExec =>
        if (ident.add(i.relation.cacheBuilder)) walk(i.relation.cachedPlan)
      case s: FileSourceScanExec => if (ident.add(s)) scans += 1
      case _: ReusedExchangeExec => reused += 1
      case e: Exchange => if (ident.add(e)) ex += 1 else reused += 1
      case _ =>
    }
    walk(df.queryExecution.executedPlan)
    PlanCosts(scans, ex, reused)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs: DataFrame = graft.QueriesCommon.fannedTable(spark, dir, "documents")

    def timed(df: => DataFrame): (Double, Long, PlanCosts) = {
      df.count() // warm (plan compile + page cache, both forms get it)
      var best = Double.MaxValue
      var rows = 0L
      var plan = PlanCosts(0, 0, 0)
      for (_ <- 1 to passes) {
        // drop the dedup barrier's persisted relation between passes:
        // CacheManager would otherwise serve it to the next logically-
        // equal plan and the timed pass would skip the corpus pass
        spark.catalog.clearCache()
        val d = df
        val t0 = System.nanoTime()
        rows = d.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        plan = costs(d)
      }
      (best, rows, plan)
    }

    println(s"== CurationBench @ $dir (min of $passes timed passes) ==")
    val inRows = docs.count()
    println(f"input: $inRows rows")

    // STAGED: the honest N-job chain. Stage k reads stage k−1's
    // materialized parquet, computes ONE stage, and writes its own
    // output; the last stage counts instead of writing, matching the
    // composed form's count action, so both forms exclude the final
    // materialization equally. Each stage runs once per pass (pass 0
    // is the unmeasured warm pass); per-stage wall is the min across
    // timed passes. Row counts for written stages are read from the
    // parquet footers OUTSIDE the timed region.
    val tmpRoot = java.nio.file.Files
      .createTempDirectory("curation-staged").toString
    val n = Curation.stages.size
    val stageWall = Array.fill(n)(Double.MaxValue)
    val stageRows = new Array[Long](n)
    val stagePlans = new Array[PlanCosts](n)
    for (pass <- 0 to passes) {
      Curation.stages.zipWithIndex.foreach { case ((_, f), i) =>
        val in = if (i == 0) docs
          else spark.read.parquet(s"$tmpRoot/stage$i")
        val out = f(in)
        val t0 = System.nanoTime()
        val lastRows =
          if (i < n - 1) {
            out.write.mode("overwrite").parquet(s"$tmpRoot/stage${i + 1}")
            -1L
          } else out.count()
        val w = (System.nanoTime() - t0) / 1e9
        if (pass > 0 && w < stageWall(i)) stageWall(i) = w
        stageRows(i) =
          if (lastRows >= 0) lastRows
          else spark.read.parquet(s"$tmpRoot/stage${i + 1}").count()
        if (pass == 0) {
          // plan costs from an EXECUTED instance: an unexecuted
          // AdaptiveSparkPlanExec reports the INITIAL plan (exchange
          // reuse unresolved, runtime re-plans unapplied), which
          // would bias the staged counts against the composed ones
          // (taken post-execution) — drive the same plan instance to
          // completion, like ExplainDump's at-scale section
          val fin = f(in)
          fin.queryExecution.executedPlan.execute().count()
          stagePlans(i) = costs(fin)
        }
      }
    }
    var prevRows = inRows
    var stagedWall = 0.0
    var stagedScans = 0
    var stagedEx = 0
    Curation.stages.zipWithIndex.foreach { case ((name, _), i) =>
      val (w, rows, p) = (stageWall(i), stageRows(i), stagePlans(i))
      stagedWall += w
      stagedScans += p.scans
      stagedEx += p.exchanges
      println(f"stage ${i + 1} $name%-15s in=$prevRows%9d out=$rows%9d " +
        f"wall=$w%7.2fs scans=${p.scans} exchanges=${p.exchanges} " +
        f"reused=${p.reused}")
      // the pack stage aggregates to bins; every earlier stage's output
      // rows are the next stage's input rows
      if (i < Curation.stages.size - 1) prevRows = rows
    }

    // COMPOSED: the single dataflow (the SparkEntry query, final sort
    // included) — one scan chain, shared exchanges.
    val (cw, crows, cp) = timed(
      graft.SparkEntry.queries("q_curation_pipeline")(spark, dir))
    println(f"composed q_curation_pipeline: out=$crows%d wall=$cw%7.2fs " +
      f"scans=${cp.scans} exchanges=${cp.exchanges} reused=${cp.reused}")
    println(f"staged totals: wall=$stagedWall%7.2fs scans=$stagedScans " +
      f"exchanges=$stagedEx")
    println(f"composed saves: ${stagedScans - cp.scans} scans, " +
      f"${stagedEx - cp.exchanges} exchanges, " +
      f"${(1 - cw / stagedWall) * 100}%.0f%% wall vs the materialized " +
      "N-job chain")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmpRoot))
    spark.stop()
  }
}
