package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes one `<query>_<suffix>.txt` per named query under an output
  * directory, each holding the query's `.explain("formatted")` output —
  * the before/after plan evidence for an optimization round
  * (`plans/r<N>/`). Runs under the bench's own session shape
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus) so the dumped
  * plans are the ones the bench executes, not a toy-session variant.
  *
  * Usage: tools/run_main.sh graft.tools.PlanFiles <dataDir> <outDir>
  *          <suffix> <q1,q2,...>
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    // default mirrors graft.Bench's (the doc claim above is literal:
    // same master, same fan-out — set SPARK_GRAFT_CPUS=32 to match the
    // driver's 32-thread bench runs)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        s"== $name @ $dir (local[$cpus]) ==\n" + plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
