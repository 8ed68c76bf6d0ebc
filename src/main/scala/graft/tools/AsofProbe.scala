package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: the OPTIMIZED/EXECUTED plan of count() over the native asof
  * — was the cosmetic orderBy eliminated below the count aggregate? */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val native = graft.SparkEntry.queries("q_asof_native")(spark, dir)
    val cnt = native.groupBy().agg(count(lit(1)))
    println("=== native count optimized logical ===")
    println(cnt.queryExecution.optimizedPlan.toString.take(2500))
    val win = graft.SparkEntry.queries("q_asof_join")(spark, dir)
    val wcnt = win.groupBy().agg(count(lit(1)))
    println("=== window count optimized logical ===")
    println(wcnt.queryExecution.optimizedPlan.toString.take(1500))
    spark.stop()
  }
}
