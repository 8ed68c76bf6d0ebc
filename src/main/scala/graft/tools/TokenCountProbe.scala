package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of token-COUNT formulations over the real documents table.
  * A token is a maximal non-whitespace run of trim(lower(text)) (the
  * QueriesCommon.toksSql contract — proof at
  * QueriesCommon.tokenCountFast), so the count can be computed without
  * materializing the token array. Two parts:
  *
  *  1. row-for-row agreement of all forms on the real corpus (a probe
  *     that only timed would let a semantically-off form look fast);
  *  2. per-row CPU cost: the corpus text is REPLICATED (×32 via an
  *     exploded sequence), cached, and each form aggregated at
  *     local[1] with min-of-5 — wall ≈ CPU, no scan/scheduling noise,
  *     unlike timing one tiny parquet scan at 32 idle cores (the
  *     first r15 probe cut did that and its ratios swung 7× between
  *     runs). */
object TokenCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.QueriesCommon.table(spark, dir, "documents")
    val forms = Seq(
      "size(filter(split))" -> size(graft.QueriesCommon.toksExpr),
      "regexp_count(\\S+)" -> regexp_count(col("text"), lit("\\S+")),
      "size(TokenXxHashes)" -> size(graft.QueriesCommon.tokenHashesCol("text")),
      "TokenCount kernel" -> graft.QueriesCommon.tokenCountFast(col("text")))
    val c = docs.select(forms.zipWithIndex.map { case ((_, e), i) =>
      e.cast("long").as(s"c$i") }: _*)
    val disagree = c.filter((1 until forms.size).map(i =>
      !(col("c0") <=> col(s"c$i"))).reduce(_ || _)).count()
    println(s"disagree rows: $disagree")
    require(disagree == 0, "count forms diverge — do not switch")
    val big = docs.select(col("text"))
      .withColumn("__r", explode(expr("sequence(1, 32)")))
      .select("text").persist()
    val rows = big.count() // fill the cache
    println(s"replicated rows: $rows")
    for ((name, e) <- forms) {
      val q = big.agg(sum(e.cast("long")))
      q.collect() // warm: codegen + JIT
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val v = q.collect()(0).getLong(0)
        ((System.nanoTime() - t0) / 1e9, v)
      }
      println(f"$name%-22s min=${t.map(_._1).min}%.3f s  sum=${t.head._2}")
    }
    spark.stop()
  }
}
