package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated query filter for local iteration; the
    // driver never sets it, so its runs always time the full set
    val only: Set[String] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    only.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[bench] unknown query in SPARK_GRAFT_ONLY: $n"))
    def picked = SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only(n) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // static conf: the default 100-entry codegen cache thrashes once a
      // workload carries more than a few dozen distinct plans, making
      // every run re-compile every whole-stage unit through Janino
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up passes, outside the timed region, so per-query timings
    // reflect the operators rather than one-time costs: first at the
    // smallest scale factor (JVM/JIT, session startup), then ONE pass
    // at the target SF — AQE picks different physical plans per data
    // size, so only a target-SF pass compiles the generated code the
    // timed pass will actually run. This matches the DuckDB baseline
    // methodology (tools/duck_bench.py times its second pass).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      picked.foreach { case (_, fn) =>
        try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
      }
    picked.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // Per-query MIN over `passes` timed runs: this host has bursty
    // neighbor contention (identical runs span 39-364 s; BASELINE.md
    // (c)), and the min is the closest observable to uncontended cost.
    // duck_bench.py applies the same min-of-N to the DuckDB side, so
    // the comparison stays engine-fair.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val results = (1 to passes).flatMap { _ =>
      picked.toSeq.sortBy(_._1).map { case (name, fn) =>
        // drop any persisted relation a previous execution registered
        // (the curation pipeline's dedup barrier): CacheManager
        // rewrites logically-equal subtrees to read the cache, so
        // without this a timed pass would skip the corpus pass its
        // DuckDB twin re-pays every run — cache reuse ACROSS runs is
        // contamination, the barrier WITHIN one run is the plan
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }.groupMapReduce(_._1)(_._2)(math.min)
    // sorted keys: the contract line can get tail-truncated by capture
    // buffers, so a deterministic order keeps which queries survive
    // predictable round-over-round; values rounded to 0.1 ms keeps the
    // whole ~100-query line a third the size of raw doubles
    def r4(v: Double): String = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${r4(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The capture path between this process and BENCH_r{N}.json has a
    // bounded buffer (round 4 lost the head of the line), so the line is
    // also written whole to a file the driver — or a human — can ingest:
    // $SPARK_GRAFT_BENCH_OUT, default bench_results.json in the repo root.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"[bench] could not write $outFile: $e") }
    // Print the contract JSON line AFTER spark.stop() (and silence the
    // shutdown logs) so nothing — executor teardown, shutdown hooks —
    // can interleave output after it: it must be the last line emitted.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(line)
    System.out.flush()
  }
}
