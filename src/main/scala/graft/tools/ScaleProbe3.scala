package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade probe for the round-6 data-mixture batch: q_mixture_sample,
  * q_token_budget, q_dedup_incremental, q_split_leakfree at 1× (sf0.1)
  * vs a 10× corpus (same id-shifted replica scheme as ScaleProbe2 —
  * documents verbatim, the all-replicas-collide duplication profile
  * that maximizes q_dedup_incremental's dup-group work). All four are
  * single-exchange shapes, so wall time should grow ≈linearly in
  * input with a constant floor. min-of-2 per point, one JVM. */
object ScaleProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir1 = "/root/testdata/sf0.1"
    val dir10 = args.headOption.getOrElse("/tmp/probe3_x10")
    val docs1 = spark.read.parquet(s"$dir1/documents.parquet")
    if (!new java.io.File(s"$dir10/documents.parquet/_SUCCESS").exists()) {
      val n = docs1.agg(max("doc_id")).head.getLong(0) + 1
      docs1.withColumn("__rep", explode(sequence(lit(0), lit(9))))
        .withColumn("doc_id", col("doc_id") + col("__rep").cast("long") * lit(n))
        .drop("__rep")
        .write.mode("overwrite").parquet(s"$dir10/documents.parquet")
    }

    val qs = Seq("q_mixture_sample", "q_token_budget",
      "q_dedup_incremental", "q_split_leakfree")
    for (name <- qs; (label, dir) <- Seq("1x" -> dir1, "10x" -> dir10)) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-22s $label%-3s $t%6.2f s")
    }
    spark.stop()
  }
}
