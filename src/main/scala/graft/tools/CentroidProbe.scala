package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: per-group centroids via posexplode vs the ElementwiseStats
  * Aggregator. NOTE what each pays: partial aggregation collapses
  * BOTH paths' exchanges to per-partition group rows, so the explode
  * path's real cost is map-side — materializing n×dims intermediate
  * rows and hash-aggregating on n×dims (group,pos) keys — while the
  * aggregator folds each vector into a fixed-width array buffer with
  * no intermediate rows. Default 1M vectors × 128 dims across 100
  * groups; min-of-N alternating passes, one JVM. */
object CentroidProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dims = args.lift(1).map(_.toInt).getOrElse(128)
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vecs = spark.range(n)
      .select((col("id") % 100).cast("int").as("label"),
        expr(s"transform(sequence(1, $dims), j -> cast(pmod(id * j, 997) / 997.0 AS float))")
          .as("embedding"))

    def explodePath() = vecs
      .select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg(avg(col("col").cast("double")).as("c"))
      .agg(sum("c")).head()
    def aggPath() = vecs
      .groupBy("label")
      .agg(graft.functions.VectorAggregates
        .elementwiseStats(col("embedding")).as("st"))
      .select(col("label"), posexplode(col("st.sum")), col("st.n"))
      .select((col("col") / col("n")).as("c"))
      .agg(sum("c")).head()

    explodePath(); aggPath() // warm
    val (a, b) = (
      (1 to passes).map { _ =>
        val t0 = System.nanoTime(); explodePath(); (System.nanoTime() - t0) / 1e9
      }.min,
      (1 to passes).map { _ =>
        val t0 = System.nanoTime(); aggPath(); (System.nanoTime() - t0) / 1e9
      }.min)
    // value cross-check
    val va = explodePath().getDouble(0)
    val vb = aggPath().getDouble(0)
    println(f"n=$n dims=$dims explode=$a%.2f s aggregator=$b%.2f s " +
      f"speedup=${a / b}%.2fx valueDelta=${math.abs(va - vb)}%.2e")
    spark.stop()
  }
}
