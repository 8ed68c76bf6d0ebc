package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the round-13 change to `QueriesExt2.idSetOp`'s PLAIN
  * (shuffled) route: distinct the fact side before the anti/semi join
  * (qAntiMissing's rule — map-side partial agg collapses the exchange,
  * the join reuses the agg's hash partitioning) vs the r12 shape that
  * shipped every filtered fact row into the join exchange. Both arms
  * build the plain shapes DIRECTLY (mirroring idSetOp's plain branch)
  * so the probe runs even where bucketed layouts exist — the layouts
  * serve the real queries; this isolates the route the layouts
  * replace. Arms ALTERNATE within each round (this host's windows
  * swing; adjacent single-shot arms lie), min per arm is the number.
  *
  * Usage: tools/run_main.sh graft.tools.IdSetOpProbe <dir> [rounds]
  */
object IdSetOpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String): DataFrame =
      graft.QueriesCommon.table(spark, dir, name)
    def left: DataFrame = t("orders")
      .select("o_orderkey", "o_orderpriority")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("id"))
    def rightRaw: DataFrame = t("lineitem")
      .select("l_orderkey", "l_returnflag")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("id"))
    def q(joinType: String, dist: Boolean): DataFrame = {
      val right = if (dist) rightRaw.distinct() else rightRaw
      left.join(right.hint("merge"), Seq("id"), joinType)
        .distinct().orderBy("id")
    }

    val arms = for {
      jt <- Seq("left_anti", "left_semi")
      dist <- Seq(false, true)
    } yield (s"$jt${if (dist) "_dist" else "_nodist"}", jt, dist)
    val best = scala.collection.mutable.Map[String, Double]()
    val rows = scala.collection.mutable.Map[String, Long]()
    // warm once per arm so plan compile / page cache is off the clock
    arms.foreach { case (label, jt, d) => rows(label) = q(jt, d).count() }
    for (r <- 1 to rounds) {
      arms.foreach { case (label, jt, d) =>
        val t0 = System.nanoTime()
        val n = q(jt, d).count()
        val w = (System.nanoTime() - t0) / 1e9
        require(n == rows(label), s"$label row drift: $n vs ${rows(label)}")
        best(label) = math.min(best.getOrElse(label, Double.MaxValue), w)
        println(f"round $r $label%-17s $w%7.2fs rows=$n")
      }
    }
    println("== minima ==")
    arms.foreach { case (label, _, _) =>
      println(f"$label%-17s ${best(label)}%7.2fs rows=${rows(label)}")
    }
    spark.stop()
  }
}
