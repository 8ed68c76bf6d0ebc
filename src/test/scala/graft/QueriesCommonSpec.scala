package graft

/** Both regimes of the small-input cost model (SURVEY §7.6): every
  * size-dependent decision — AQE, shuffle fan-out, kernel fan-out —
  * keys off total input bytes vs `graft.adaptive.minInputBytes`. The
  * bench exercises only the sub-threshold branch (test data is
  * megabytes), so the at-scale branch is pinned here by lowering the
  * threshold to one byte. */
class QueriesCommonSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val prop = "graft.adaptive.minInputBytes"

  private def withThreshold[A](v: Option[String])(body: => A): A = {
    val old = Option(System.getProperty(prop))
    try {
      v match {
        case Some(x) => System.setProperty(prop, x)
        case None => System.clearProperty(prop)
      }
      body
    } finally {
      old match {
        case Some(x) => System.setProperty(prop, x)
        case None => System.clearProperty(prop)
      }
    }
  }

  test("sub-threshold inputs: AQE off, fan-out sized from bytes, kernels fanned") {
    withThreshold(None) { // default 1 GiB; test data is far below
      QueriesCommon.table(spark, dir, "documents")
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
      // ~0.5 MB input → the 4-partition parallelism floor (which this
      // test session's default happens to equal)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
      // bloom injection stays at Spark's conservative defaults below
      // the gate (the extra build stage is pure floor at MB scale)
      assert(spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold") == "10MB")
      // single-row-group scan = 1 task; the fanned loader must widen it
      val fanned = QueriesCommon.fannedTable(spark, dir, "documents")
      assert(fanned.rdd.getNumPartitions ==
        spark.sparkContext.defaultParallelism)
    }
  }

  test("at-scale inputs: AQE on, session fan-out restored, bare scan") {
    withThreshold(Some("1")) { // everything is now "at scale"
      QueriesCommon.table(spark, dir, "documents")
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      // AQE owns shuffle sizing; the session default must come back
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
      // at-scale branch widens the runtime bloom-filter gates so a
      // probe side that grows with the fact table still injects
      // (BloomProbe A/B, BASELINE.md §e)
      assert(spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold") == "64MB")
      // no round-robin exchange on the at-scale branch: the fanned
      // loader degrades to the bare scan (its single row-group task)
      val bare = QueriesCommon.fannedTable(spark, dir, "documents")
      assert(bare.rdd.getNumPartitions == 1)
      assert(!bare.queryExecution.executedPlan.toString
        .contains("RoundRobinPartitioning"))
    }
    // leave the session the way the other suites expect it
    QueriesCommon.table(spark, dir, "documents")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
  }
}
