package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Scale

/** Round-9 ask #1, part 2: the "cluster pre-shards it" demonstration
  * for the q_join_agg spine at 15.7 GiB. JoinAggProbe established
  * there is NO spill at any partition count and the shuffle volume is
  * the constant 4.57 GB / 630M records the join semantically needs —
  * so the single-JVM gap vs DuckDB's shared-memory hash join is the
  * exchange itself (serialize + write + read + deserialize 630M rows).
  * A cluster removes that exchange by LAYOUT: fact tables live
  * bucketed by join key (co-located, `ops/Scale.writeBucketed`), and
  * the same join then plans with ZERO Exchange on either side. This
  * probe materializes the spine's two sides bucketed by orderkey (a
  * one-time layout cost a warehouse amortizes over every downstream
  * join), re-runs the identical q_join_agg tail, asserts the
  * exchange-free plan, and times it against the shuffled shape.
  *
  * Usage: runMain graft.tools.BucketSpineProbe <dir> [buckets] [passes]
  */
object BucketSpineProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata15")
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // one-time layout: ONLY the columns the spine exchanges, bucketed
    // and sorted by the join key; repartition first so each write task
    // holds exactly one bucket (bucketBy and repartition share the
    // Murmur3 hash) and emits one file
    // columns cover BOTH weak spines (q_join_agg and q_semi_idlist);
    // each tail still scans only its own columns (parquet pruning), so
    // sharing one layout costs neither tail anything at read time
    val t0 = System.nanoTime()
    Scale.writeBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount",
          "l_returnflag", "l_quantity")
        .repartition(buckets, col("l_orderkey")),
      "li_bkt", "l_orderkey", buckets)
    Scale.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .repartition(buckets, col("o_orderkey")),
      "o_bkt", "o_orderkey", buckets)
    println(f"# bucketed layout written in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(one-time; a warehouse pays this at ingest)")

    def tail(li: DataFrame, o: DataFrame): DataFrame = {
      val c = spark.read.parquet(s"$dir/customer.parquet")
        .select("c_custkey", "c_nationkey")
      val n = spark.read.parquet(s"$dir/nation.parquet")
        .select("n_nationkey", "n_name")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }

    // q_semi_idlist's tail: LEFT SEMI on the urgent-orders id set, then
    // the returnflag rollup — the other round-9 weak spine. On the
    // bucketed layout the semi-join is exchange-free the same way.
    def semiTail(li: DataFrame, o: DataFrame): DataFrame =
      li.join(o.filter(col("o_orderpriority") === "1-URGENT")
            .select("o_orderkey"),
          li("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)").as("sum_qty"))
        .orderBy("l_returnflag")

    val bucketed = tail(spark.table("li_bkt"), spark.table("o_bkt"))
    val shuffled = tail(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount"),
      spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey"))
    val bucketedSemi = semiTail(spark.table("li_bkt"), spark.table("o_bkt"))
    val shuffledSemi = semiTail(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_returnflag", "l_quantity"),
      spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority"))

    // plan proof: the bucketed spines join with no Exchange below the
    // join (the only exchange left is the tiny final aggregate)
    for ((label, df) <- Seq("join_agg" -> bucketed, "semi" -> bucketedSemi)) {
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)"
        .r.findAllIn(plan).size
      println(s"# join-key exchanges in bucketed $label plan: $exchanges (want 0)")
      require(exchanges == 0, s"bucketed $label spine still exchanges:\n$plan")
    }

    // identical results
    val a = bucketed.collect().map(_.toString).toSeq
    val b = shuffled.collect().map(_.toString).toSeq
    require(a == b, "bucketed tail diverged from shuffled tail")
    val as = bucketedSemi.collect().map(_.toString).toSeq
    val bs = shuffledSemi.collect().map(_.toString).toSeq
    require(as == bs, "bucketed semi tail diverged from shuffled semi tail")
    println(s"# results agree: ${a.size} rows (join_agg), ${as.size} rows (semi)")

    def timed(df: DataFrame): Double = {
      val t = (1 to passes).map { _ =>
        val s0 = System.nanoTime(); df.count(); (System.nanoTime() - s0) / 1e9
      }
      println(s"#   passes: ${t.map(x => f"$x%.1f").mkString(", ")}")
      t.min
    }
    // interleave the arms so host-contention windows hit both
    for ((label, bk, sh) <- Seq(
        ("join_agg", bucketed, shuffled),
        ("semi", bucketedSemi, shuffledSemi))) {
      println(s"# $label timing (interleaved, min of passes):")
      val pairs = (1 to passes).map { _ =>
        val s0 = System.nanoTime(); bk.count()
        val tb = (System.nanoTime() - s0) / 1e9
        val s1 = System.nanoTime(); sh.count()
        val ts = (System.nanoTime() - s1) / 1e9
        println(f"#   bucketed $tb%6.2f s | shuffled $ts%6.2f s")
        (tb, ts)
      }
      val (tb, ts) = (pairs.map(_._1).min, pairs.map(_._2).min)
      println(f"$label: bucketed=${tb}%.2f s shuffled=${ts}%.2f s speedup=${ts / tb}%.2fx")
    }
    spark.stop()
  }
}
