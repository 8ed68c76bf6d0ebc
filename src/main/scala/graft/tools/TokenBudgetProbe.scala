package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Mixture

/** Skewed decade probe for the token-budget kernels: one source holds
  * ~90% of the corpus (the CommonCrawl shape the salted path exists
  * for), measured at 1× and 10× the sf0.1 documents table. The exact
  * kernel funnels the hot source through ONE window partition — its
  * cost grows with the source; the salted kernel keeps/drops whole
  * top-byte buckets map-side and sorts only the ~1/256 boundary
  * slice, so its window cost is bounded by slice size, not source
  * size. Both kernels must agree row-for-row at both scales (they are
  * property-tested equal; the probe re-asserts it on the skewed
  * corpus as a belt-and-braces check while timing).
  */
object TokenBudgetProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n1 = d1.count()
    // skew: ~90% of docs into one hot source, budget sized so the
    // boundary sits deep in the hot source (a real prefix, not all/none)
    def skewed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("source",
        when(Mixture.bucket("doc_id") < 230, lit("crawl_hot"))
          .otherwise(col("source")))
      .withColumn("toks", expr(s"size(${graft.QueriesCommon.toksSqlFor("text")})"))
      .withColumn("budget",
        when(col("source") === "crawl_hot", lit(2000000L)).otherwise(lit(50000L)))
    val s1 = skewed(d1).localCheckpoint(true)
    val d10Path = "/tmp/documents_x10.parquet"
    if (!new java.io.File(d10Path, "_SUCCESS").exists()) {
      (0 until 10).map(i => d1.withColumn("doc_id", col("doc_id") + lit(i * n1)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(d10Path)
    }
    val s10 = skewed(spark.read.parquet(d10Path)
        .withColumn("budget10", lit(0L))) // placeholder col dropped below
      .drop("budget10")
      // 10× corpus, 10× hot budget: boundary stays mid-source
      .withColumn("budget",
        when(col("source") === "crawl_hot", lit(20000000L)).otherwise(lit(500000L)))
      .localCheckpoint(true)

    // warm-up both kernels
    Mixture.tokenBudget(s1.limit(2000), "source", "doc_id",
      col("toks"), col("budget")).count()
    Mixture.tokenBudgetSalted(s1.limit(2000), "source", "doc_id",
      col("toks"), col("budget")).count()

    // optional third decade (arg "x100"): ~5M docs, hot source ~4.5M
    // rows — the regime where the exact kernel's single window
    // partition holds millions of rows and the salted path's bounded
    // boundary slice starts paying for its two extra fixed stages
    val s100opt =
      if (args.contains("x100")) {
        val d100Path = "/tmp/documents_x100.parquet"
        if (!new java.io.File(d100Path, "_SUCCESS").exists()) {
          val d10 = spark.read.parquet(d10Path)
          (0 until 10).map(i =>
              d10.withColumn("doc_id", col("doc_id") + lit(i * 10 * n1)))
            .reduce(_ unionByName _)
            .write.mode("overwrite").parquet(d100Path)
        }
        Seq(("100x (5M docs, 90% one source)",
          skewed(spark.read.parquet(d100Path))
            .withColumn("budget",
              when(col("source") === "crawl_hot", lit(200000000L))
                .otherwise(lit(5000000L)))))
      } else Nil

    for ((label, s) <- Seq(("1x (50k docs, 90% one source)", s1),
        ("10x (500k docs, 90% one source)", s10)) ++ s100opt) {
      val exact = time(s"exact window   $label")(
        Mixture.tokenBudget(s, "source", "doc_id",
          col("toks"), col("budget")).count())
      val salted = time(s"salted buckets $label")(
        Mixture.tokenBudgetSalted(s, "source", "doc_id",
          col("toks"), col("budget")).count())
      println(s"  kept: exact=$exact salted=$salted " +
        (if (exact == salted) "EQUAL" else "*** MISMATCH ***"))
      require(exact == salted, "salted diverged from exact on skewed corpus")
    }
    spark.stop()
  }
}
