package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Replicate a documents table into a doc-only at-scale corpus for the
  * curation-pipeline bench: `reps` copies with doc_ids offset into
  * disjoint ranges (sources and texts repeat — the dup-heavy profile a
  * crawl corpus actually has, which is exactly what the dedup stages
  * exist for). Output dir carries ONLY documents.parquet, so the
  * at-scale gate (total input bytes) reflects the corpus being
  * curated.
  *
  * Usage: tools/run_main.sh graft.tools.DocCorpusGen <srcDir> <outDir> <reps>
  */
object DocCorpusGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val reps = args(2).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val rep = spark.range(0, reps).select(col("id").as("__rep"))
    docs.crossJoin(rep)
      .withColumn("doc_id",
        col("doc_id") + col("__rep") * lit(100000000L))
      .drop("__rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val n = spark.read.parquet(s"$out/documents.parquet").count()
    println(s"wrote $n docs to $out/documents.parquet")
    spark.stop()
  }
}
