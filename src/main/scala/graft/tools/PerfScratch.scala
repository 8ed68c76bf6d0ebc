package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc perf scratchpad: times named sub-steps of the slowest bench
  * queries so optimization targets the measured cost, not a guess.
  * Usage: sbt "runMain graft.tools.PerfScratch <sfDir> <which>" */
object PerfScratch {
  def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIME $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "asof"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm
    time("warm") {
      graft.SparkEntry.queries("q1_agg")(spark, dir).count()
    }

    which match {
      case "asof" => asof(spark, dir)
      case "asofnative" => asofNative(spark, dir)
      case "ivf" => ivf(spark, dir)
      case "joinagg" => joinAgg(spark, dir)
      case "plansplit" =>
        // split one query's wall into construct (driver actions inside
        // the builder) / plan (analysis+optimization+physical) / exec —
        // so "driver floor" claims point at the measured component
        val name = args(2)
        val fn = graft.SparkEntry.queries(name)
        fn(spark, dir).count() // warm
        (1 to 3).foreach { i =>
          spark.catalog.clearCache()
          val df = time(s"$name construct$i") { fn(spark, dir) }
          time(s"$name plan$i") { df.queryExecution.executedPlan }
          time(s"$name exec$i") { df.count() }
        }
      case other =>
        graft.SparkEntry.queries.get(other).foreach { fn =>
          (1 to 3).foreach { i => time(s"$other run$i") { fn(spark, dir).count() } }
        }
    }
    spark.stop()
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def asof(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val q = graft.SparkEntry.queries("q_asof_broadcast")
    (1 to 3).foreach { i => time(s"full run$i") { q(spark, dir).count() } }
    // pieces
    val ev = t(spark, dir, "events")
    time("events date project count") {
      ev.select(col("event_id"), col("user_id"),
        date_from_unix_date(graft.QueriesCommon.eventDay(ev).cast("int"))
          .as("event_date")).count()
    }
    val orders = t(spark, dir, "orders")
      .groupBy(col("o_custkey"), trunc(col("o_orderdate"), "month").as("om"))
      .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("top_price"))
    time("orders rollup collect") { orders.collect().length }
    time("orders rollup collect 2") { orders.collect().length }
    val left = ev.select(col("event_id"), col("user_id"),
      date_from_unix_date(graft.QueriesCommon.eventDay(ev).cast("int"))
        .as("event_date"))
    time("asof no-sort count") {
      graft.ops.AsofJoin.asofBackwardBroadcast(left, orders,
        "user_id", "o_custkey", "event_date", "om").count()
    }
    time("asof no-sort count 2") {
      graft.ops.AsofJoin.asofBackwardBroadcast(left, orders,
        "user_id", "o_custkey", "event_date", "om").count()
    }
  }

  def asofNative(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    def events = {
      val raw = t(spark, dir, "events")
      raw.select(col("event_id"), col("user_id"),
        date_from_unix_date(graft.QueriesCommon.eventDay(raw).cast("int"))
          .as("event_date"))
    }
    def orders = t(spark, dir, "orders")
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("top_price"))
    println(s"events rows: ${events.count()}, orders rollup rows: ${orders.count()}")
    (1 to 3).foreach { i => time(s"inputs only run$i") {
      events.count(); orders.count() } }
    (1 to 3).foreach { i => time(s"native no-sort run$i") {
      graft.plans.AsofJoinNative.asof(events, orders,
        "user_id", "o_custkey", "event_date", "od").count() } }
    (1 to 3).foreach { i => time(s"window no-sort run$i") {
      graft.ops.AsofJoin.asofBackward(events, orders,
        "user_id", "o_custkey", "event_date", "od").count() } }
    (1 to 3).foreach { i => time(s"native full run$i") {
      graft.SparkEntry.queries("q_asof_native")(spark, dir).count() } }
    (1 to 3).foreach { i => time(s"window full run$i") {
      graft.SparkEntry.queries("q_asof_join")(spark, dir).count() } }
  }

  def joinAgg(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val q = graft.SparkEntry.queries("q_join_agg")
    (1 to 3).foreach { i => time(s"current run$i") { q(spark, dir).count() } }
    def variant(bcastOrders: Boolean): DataFrame = {
      val li = t(spark, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
      val o0 = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
      val o = if (bcastOrders) broadcast(o0) else o0
      val c = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
      val n = t(spark, dir, "nation").select("n_nationkey", "n_name")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }
    (1 to 3).foreach { i => time(s"projected run$i") { variant(false).count() } }
    (1 to 3).foreach { i => time(s"bcast-orders run$i") { variant(true).count() } }
  }

  def ivf(spark: SparkSession, dir: String): Unit = {
    val q = graft.SparkEntry.queries("q_ann_ivf")
    (1 to 3).foreach { i => time(s"full run$i") { q(spark, dir).count() } }
  }
}
