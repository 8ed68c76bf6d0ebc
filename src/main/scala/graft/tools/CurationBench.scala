package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.Curation

/** The composed-vs-staged evidence run for the curation pipeline
  * (round-13 ask #1): run each stage PREFIX standalone (what six
  * separate jobs would do), then the composed one-dataflow form, and
  * report per-stage rows in/out, per-stage wall, and the plan costs
  * that composition actually saves — corpus scans and exchanges.
  *
  * Usage: tools/run_main.sh graft.tools.CurationBench <dir> [passes]
  * Appends nothing; prints a block suitable for docs/artifacts.
  */
object CurationBench {
  private def scans(p: String): Int = "Scan parquet".r.findAllIn(p).size
  private def exchanges(p: String): Int =
    "(?<!Reused)Exchange ".r.findAllIn(p).size
  private def reused(p: String): Int = "ReusedExchange".r.findAllIn(p).size

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
    def prefix(n: Int): DataFrame =
      Curation.stages.take(n).foldLeft(docs) { case (df, (_, f)) => f(df) }

    def timed(df: => DataFrame): (Double, Long, String) = {
      df.count() // warm (plan compile + page cache, both forms get it)
      var best = Double.MaxValue
      var rows = 0L
      var plan = ""
      for (_ <- 1 to passes) {
        val d = df
        val t0 = System.nanoTime()
        rows = d.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        plan = d.queryExecution.executedPlan.toString
      }
      (best, rows, plan)
    }

    println(s"== CurationBench @ $dir (min of $passes timed passes) ==")
    val inRows = docs.count()
    println(f"input: $inRows rows")

    // STAGED: each prefix materialized standalone — the cost of running
    // the pipeline as N separate jobs (every prefix re-scans and
    // re-computes everything before it, which is exactly what chaining
    // six independent spark-submit jobs without intermediate
    // materialization-to-disk would avoid only by paying writes).
    var prevRows = inRows
    var stagedWall = 0.0
    var stagedScans = 0
    var stagedEx = 0
    Curation.stages.zipWithIndex.foreach { case ((name, _), i) =>
      val (w, rows, p) = timed(prefix(i + 1))
      stagedWall += w
      stagedScans += scans(p)
      stagedEx += exchanges(p)
      println(f"stage ${i + 1} $name%-15s in=$prevRows%9d out=$rows%9d " +
        f"wall=$w%7.2fs scans=${scans(p)} exchanges=${exchanges(p)} " +
        f"reused=${reused(p)}")
      // the pack stage aggregates to bins; every earlier stage's output
      // rows are the next stage's input rows
      if (i < Curation.stages.size - 1) prevRows = rows
    }

    // COMPOSED: the single dataflow (the SparkEntry query, final sort
    // included) — one scan chain, shared exchanges.
    val (cw, crows, cp) = timed(
      graft.SparkEntry.queries("q_curation_pipeline")(spark, dir))
    println(f"composed q_curation_pipeline: out=$crows%d wall=$cw%7.2fs " +
      f"scans=${scans(cp)} exchanges=${exchanges(cp)} reused=${reused(cp)}")
    println(f"staged totals: wall=$stagedWall%7.2fs scans=$stagedScans " +
      f"exchanges=$stagedEx")
    println(f"composed saves: ${stagedScans - scans(cp)} scans, " +
      f"${stagedEx - exchanges(cp)} exchanges, " +
      f"${(1 - cw / stagedWall) * 100}%.0f%% wall vs running stages standalone")
    spark.stop()
  }
}
