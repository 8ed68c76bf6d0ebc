package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: the sampling coin (md5 bucket of a stringified id) as
  * the SQL instr-hex idiom vs the codegen'd Md5Bucket expression, on
  * a generated id stream wide enough (default 20M rows) that per-row
  * expression cost dominates scheduling. Alternating A/B passes,
  * min-of-N each, one JVM — the same discipline as the other floor
  * probes. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sqlForm = expr(
      "(instr('0123456789abcdef', substr(md5(cast(id AS string)), 31, 1)) - 1) * 16" +
        " + instr('0123456789abcdef', substr(md5(cast(id AS string)), 32, 1)) - 1")
    val native = graft.ops.Mixture.bucket("id")

    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      // sum of buckets: forces every row, tiny result, no shuffle of note
      spark.range(n).select(c.cast("long").as("b")).agg(sum("b")).head()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both
    time(sqlForm); time(native)
    val (a, b) = (
      (1 to passes).map(_ => time(sqlForm)).min,
      (1 to passes).map(_ => time(native)).min)
    // correctness cross-check rides along
    val bad = spark.range(1000000)
      .select(sqlForm.as("q"), native.as("m"))
      .filter(col("q") =!= col("m")).count()
    println(f"rows=$n sqlForm=$a%.2f s native=$b%.2f s speedup=${a / b}%.2fx mismatches=$bad")
    spark.stop()
  }
}
