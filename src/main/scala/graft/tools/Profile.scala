package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{TextFunctions => TF}

/** Ad-hoc stage profiler for the slow bench queries: times each
  * sub-stage of the near-dup pipelines at a given SF dir so
  * optimization targets measurements, not guesses. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    // stage-by-stage: ngram jaccard
    val sh = docs.select(col("doc_id"),
      explode(TF.wordShingles(col("text"), 3)).as("sh"))
    time("shingle explode")(sh.count())
    time("shingle explode (2nd)")(sh.count())
    val df = sh.groupBy("sh").agg(count(lit(1)).as("c"))
    time("shingle df groupBy")(df.count())
    val kept = sh.join(df.filter(col("c") <= 10), "sh").select("doc_id", "sh")
    time("kept join")(kept.count())
    val k2 = kept.persist()
    k2.count()
    val a = k2.toDF("da", "sh"); val b = k2.toDF("db", "sh")
    val inter = a.join(b, Seq("sh")).filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("i"))
    time("self-join + pair groupBy")(inter.count())
    k2.unpersist()
    time("full ngramJaccardPairs")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 10, 0.1).count())

    // stage-by-stage: minhash
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 32)
    time("minhash signatures")(sigs.count())
    time("minhash signatures (2nd)")(sigs.count())
    time("full minhashLshPairs")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.25).count())

    // embeddings
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("embed neardup")(
      Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 8, 0.25).count())
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    time("ann lsh")(
      graft.similarity.Knn.lshTopK(q, emb.select("vec_id", "embedding"), 4, 3).count())
    spark.stop()
  }
}
