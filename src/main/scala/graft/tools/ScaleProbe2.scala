package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueriesExt5, SparkEntry}

/** Decade probe for the round-4 operators (VERDICT r4 ask #4):
  * q_semdedup, q_bm25, q_lm_score at 1× (sf0.1) vs 10× corpus, plus
  * the scale knobs each one carries:
  *   - SemDeDup plane count: +2 planes → 4× more buckets → the
  *     within-bucket quadratic term shrinks ~4× per bucket, which is
  *     how the paper's cluster count k bounds pair work as the corpus
  *     grows;
  *   - BM25 df-cap: dropping tokens with df > cap (impact pruning /
  *     WAND territory) bounds the stopword partitions that otherwise
  *     grow linearly with the corpus and dominate the one shuffle.
  * The 10× corpus is id-shifted replicas (documents verbatim — the
  * adversarial all-replicas-collide duplication profile; embeddings
  * with component-0 perturbed by i/1000 so replicas are near- but not
  * exact-duplicates, same as tools/BigGen). */
object ScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir1 = "/root/testdata/sf0.1"
    val dir10 = args.headOption.getOrElse("/tmp/probe_x10")

    // self-generate the 10× dir if absent (_SUCCESS, not the bare dir,
    // so an interrupted write regenerates)
    val docs1 = spark.read.parquet(s"$dir1/documents.parquet")
    if (!new java.io.File(s"$dir10/documents.parquet/_SUCCESS").exists()) {
      val n = docs1.agg(max("doc_id")).head.getLong(0) + 1
      docs1.withColumn("__rep", explode(sequence(lit(0), lit(9))))
        .withColumn("doc_id", col("doc_id") + col("__rep").cast("long") * lit(n))
        .drop("__rep")
        .write.mode("overwrite").parquet(s"$dir10/documents.parquet")
    }
    val emb1 = spark.read.parquet(s"$dir1/embeddings.parquet")
    if (!new java.io.File(s"$dir10/embeddings.parquet/_SUCCESS").exists()) {
      val n = emb1.agg(max("vec_id")).head.getLong(0) + 1
      emb1.withColumn("__rep", explode(sequence(lit(0), lit(9))))
        .withColumn("vec_id", col("vec_id") + col("__rep").cast("long") * lit(n))
        .withColumn("embedding", concat(
          array((element_at(col("embedding"), 1)
            + col("__rep").cast("float") / lit(1000.0f)).cast("float")),
          slice(col("embedding"), 2, 1000000)))
        .drop("__rep")
        .write.mode("overwrite").parquet(s"$dir10/embeddings.parquet")
    }

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    // warm-up at sf0.001 (JIT + codegen), outside the timed region
    Seq("q_semdedup", "q_bm25", "q_lm_score").foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
    }

    for (q <- Seq("q_semdedup", "q_bm25", "q_lm_score"); (tag, d) <-
        Seq("5k docs / 2k vecs" -> dir1, "50k docs / 20k vecs" -> dir10))
      time(s"$q $tag")(SparkEntry.queries(q)(spark, d).count())

    // ---- knob 1: SemDeDup plane count at 10× ----
    // 10× replicas of every vector share buckets (cos ≈ 1 across
    // replicas), so per-bucket pair work grows ~100× at fixed planes —
    // the worst case. +2 planes (4× buckets) is the paper's k knob.
    val emb10 = spark.read.parquet(s"$dir10/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
    for (planes <- Seq(6, 8, 10))
      time(s"semdedup 20k vecs, planes=$planes")(
        QueriesExt5.semDedupSurvivors(emb10, planes).count())

    // ---- knob 2: BM25 df-cap at 10× ----
    // Same shape as q_bm25 but tokens with df > cap are dropped after
    // the one shuffle's first window (impact pruning): stopword
    // partitions stop growing with the corpus. Scores become the
    // pruned approximation — the knob trades exactly that.
    val toksArr = "filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')"
    def bm25DfCap(dir: String, dfCap: Long): Long = {
      val (k1, b) = (1.2, 0.75)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
      val toks = docs.select(col("doc_id"),
        expr(s"size($toksArr)").cast("double").as("dl"),
        explode(expr(s"transform($toksArr, x -> xxhash64(x))")).as("tok"))
      val probeVocab = docs.filter(col("doc_id") < 5)
        .select(explode(expr(s"transform($toksArr, x -> xxhash64(x))")).as("tok"))
        .distinct()
      val stats = docs.select(expr(s"size($toksArr)").cast("double").as("dl0"))
        .agg(count(lit(1)).cast("double").as("n"), avg("dl0").as("avgdl"))
      val wTok = Window.partitionBy("tok")
      toks.join(broadcast(probeVocab), Seq("tok"), "left_semi")
        .repartition(col("tok"))
        .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
        .withColumn("df", count(lit(1)).over(wTok))
        .filter(col("df") <= dfCap) // the knob
        .withColumn("qids",
          collect_set(when(col("doc_id") < 5, col("doc_id"))).over(wTok))
        .select(explode(col("qids")).as("query_id"), col("doc_id"),
          col("tf").cast("double").as("tf"), col("dl"),
          col("df").cast("double").as("df"))
        .crossJoin(broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(sum(
          log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("score"))
        .count()
    }
    // caps sized to THIS corpus's df distribution (31-token synthetic
    // vocabulary, df min 2.5k / median 38.6k / max 39.2k at 10×): 39k
    // prunes the heaviest stopword partitions, 10k keeps only the
    // rare-token tail
    for (cap <- Seq(Long.MaxValue, 39000L, 10000L))
      time(s"bm25 50k docs, dfCap=${if (cap == Long.MaxValue) "off" else cap}")(
        bm25DfCap(dir10, cap))

    // ---- round-6 addition: exact-substring excision at 1× vs 10× ----
    // The 10× corpus replicates every document verbatim, so EVERY
    // gram is duplicated and EVERY token gets excised — the maximal
    // coverage case. Work stays linear (grams ×10, gram groups
    // unchanged with 10× members each, covered = all tokens); the
    // survivors count collapses to 0, the adversarial profile's
    // correct answer.
    def docsOf(d: String) = spark.read.parquet(s"$d/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    for ((tag, d) <- Seq("5k docs" -> dir1, "50k docs (all replicas)" -> dir10))
      time(s"excise $tag, survivors")(
        graft.dedup.Dedup.exciseDupSpans(docsOf(d), "doc_id", "text")
          .filter(col("clean") =!= "").count())

    spark.stop()
  }
}
