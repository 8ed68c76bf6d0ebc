package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** One-off r16 scratch: why does the probe's re-created
  * preagg-by-custkey (ja:decagg) run ~3x slower than the shipped
  * q_join_agg at bigdata15 when the partial-agg expressions are
  * identical? Dump both formatted plans for a diff. */
object JaPlanDiff {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata15")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def li(cols: String*) =
      graft.QueriesCommon.spineOpt(spark, dir, "lineitem", cols).get
    def ord(cols: String*) =
      graft.QueriesCommon.spineOpt(spark, dir, "orders", cols).get
    val spine = li("l_orderkey", "l_extendedprice", "l_discount")
      .hint("merge")
      .join(ord("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
    val decagg = spine.groupBy(col("o_custkey"))
      .agg(expr("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))")
        .as("__rev"), count(lit(1)).as("__cnt"))
      .agg(expr("SUM(__rev)"), sum("__cnt"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/ja_decagg_plan.txt"),
      decagg.queryExecution.explainString(ExplainMode.fromString("formatted")))
    val ship = graft.SparkEntry.queries("q_join_agg")(spark, dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/ja_ship_plan.txt"),
      ship.queryExecution.explainString(ExplainMode.fromString("formatted")))
    println("wrote /tmp/ja_decagg_plan.txt /tmp/ja_ship_plan.txt")
    spark.stop()
  }
}
