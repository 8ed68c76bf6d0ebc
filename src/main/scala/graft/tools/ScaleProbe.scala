package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.QueriesCommon
import graft.dedup.Dedup

/** Scale-sanity probe: times the near-dup pipelines at 1× and 10× the
  * sf0.1 documents corpus, so scaling behavior is measured rather than
  * assumed (the prompt's "would this hold at 1000×" question, answered
  * at the decade that fits this machine). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val d10Path = args.headOption.getOrElse("/tmp/documents_x10.parquet")
    // self-generate the 10× corpus (id-shifted replicas) if absent —
    // _SUCCESS, not the bare dir, so an interrupted write regenerates
    if (!new java.io.File(d10Path, "_SUCCESS").exists()) {
      val n = d1.count()
      (0 until 10).map(i => d1.withColumn("doc_id", col("doc_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(d10Path)
    }
    val d10 = spark.read.parquet(d10Path)

    // warm-up (JIT + codegen)
    Dedup.ngramJaccardPairs(d1.limit(500), "doc_id", "text", 3, 10, 0.1).count()
    Dedup.minhashLshPairs(d1.limit(500), "doc_id", "text", 3, 32, 8, 0.25).count()

    time("ngramJaccard 5k docs")(
      Dedup.ngramJaccardPairs(d1, "doc_id", "text", 3, 10, 0.1).count())
    time("ngramJaccard 50k docs")(
      Dedup.ngramJaccardPairs(d10, "doc_id", "text", 3, 10, 0.1).count())
    time("minhashLsh 5k docs")(
      Dedup.minhashLshPairs(d1, "doc_id", "text", 3, 32, 8, 0.25).count())
    time("minhashLsh 50k docs")(
      Dedup.minhashLshPairs(d10, "doc_id", "text", 3, 32, 8, 0.25).count())
    time("simhash 50k docs")(
      Dedup.simhashes(d10, "doc_id", "text").count())
    // Banded pairing is COMPLETE for hamming<=3, so the 10x corpus is
    // its worst case too: every replica group collides in all 4 bands
    // of every bucket it lands in. Work must stay bucket-bounded.
    time("simhashBanded pairs 5k docs")(
      Dedup.simhashPairsBanded(d1, "doc_id", "text", 3).count())
    time("simhashBanded pairs 50k docs")(
      Dedup.simhashPairsBanded(d10, "doc_id", "text", 3).count())
    time("exact dedup 50k docs")(
      Dedup.exactGroups(d10, "doc_id", md5(col("text"))).count())

    // Connected components: edge count grows ~27× (ngram) / ~1000×
    // (minhash) across the decade, so this probes CC's scaling in the
    // dimension that matters — edges — not just docs.
    import graft.dedup.DupClusters
    val e1 = Dedup.ngramJaccardPairs(d1, "doc_id", "text", 3, 10, 0.1)
      .localCheckpoint(true)
    time("cc over ngram pairs (1x edges)")(
      DupClusters.connectedComponents(e1, "doc_a", "doc_b",
        localEdgeThreshold = 0).count())
    val e10 = Dedup.minhashLshPairs(d10, "doc_id", "text", 3, 32, 8, 0.25)
      .localCheckpoint(true)
    time("cc over minhash pairs (250k edges)")(
      DupClusters.connectedComponents(e10, "doc_a", "doc_b",
        localEdgeThreshold = 0).count())

    // ANN scale: PQ encode + IVF-PQ search at 1× vs 10× vectors.
    // Codebook/centroid training is bounded (trainCap) so only the
    // ENCODE and probe-scan stages grow with the corpus — the property
    // that must hold at 1000×.
    import graft.similarity.IvfPq
    val v1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val x10Path = "/tmp/embeddings_x10.parquet"
    // _SUCCESS (not the bare dir) guards against a half-written
    // leftover from an interrupted run silently skewing the 10× side
    if (!new java.io.File(x10Path, "_SUCCESS").exists()) {
      val n = v1.count()
      (0 until 10).map(i => v1.select(
          (col("vec_id") + lit(i * n)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(x10Path)
    }
    val v10 = spark.read.parquet(x10Path)
    def annProbe(vs: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val idx = IvfPq.build(vs, "vec_id", "embedding", dim = 64,
        nlist = 8, m = 8, ksub = 16, seed = 42L, maxIter = 5,
        sampleFraction = 0.5, trainCap = 4096)
      // count(codes) forces the encode expressions (a bare count()
      // would column-prune them into a parquet row count), and the
      // localCheckpoint materializes the encoded index so the SEARCH
      // timing below measures probe-scan + ADC, not a re-encode.
      var enc: org.apache.spark.sql.DataFrame = null
      time(s"ivfpq encode $tag") {
        enc = idx.encoded.localCheckpoint(true)
        enc.agg(count(col("codes"))).head.getLong(0)
      }
      val searchIdx = idx.copy(encoded = enc)
      val q = vs.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      time(s"ivfpq search k=5 nprobe=2 $tag")(
        IvfPq.search(searchIdx, q, k = 5, nprobe = 2).count())
      enc.unpersist(false)
    }
    annProbe(v1, "2k vecs")
    annProbe(v10, "20k vecs")

    // Exact cosine pairs: intentionally quadratic in TOTAL work — the
    // probe shows the block-tile join spreads it (per-task memory one
    // tile, plain equi-join shuffle) rather than hiding it. The decade
    // costs ~100× compute, as theory says; LSH above stays the
    // sub-quadratic scale path. b=8 → b=32 grows the tile COUNT ~15×
    // and each tile's pair-work ~6.8× (per-block rows go 250 → 625);
    // holding per-tile work truly constant needs blocks ∝ n (8 → 80) —
    // size `blocks` to the tile budget, not to sqrt(n).
    time("exactCosinePairs 2k vecs (b=8)")(
      Dedup.exactCosinePairs(v1, "vec_id", "embedding", 0.5, blocks = 8)
        .count())
    time("exactCosinePairs 20k vecs (b=32)")(
      Dedup.exactCosinePairs(v10, "vec_id", "embedding", 0.5, blocks = 32)
        .count())

    // Bloom-prefiltered semi-join vs plain semi-join on the sf0.1 fact
    // table: the result sets are identical (QueriesExt6Spec asserts it);
    // the probe shows what the prefilter buys/costs at this scale. At
    // 100 TB the win is the fact-side shuffle carrying ~13% of rows.
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val urgent = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    time("plain semi-join 600k lineitem")(
      li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
        .count())
    time("bloom semi-join 600k lineitem")(
      graft.ops.Scale.bloomSemiJoin(li, col("l_orderkey"),
        urgent, col("o_orderkey"), expectedItems = 200000L).count())

    // tf-idf pair scoring: probe set ×5 (100 → 500 docs) over the 10×
    // corpus — candidate pairs grow ~25×, corpus df work ~10×; the
    // inverted-index join must stay token-bounded.
    def tfidfPairs(docs: org.apache.spark.sql.DataFrame,
        probeLt: Int): Long = {
      val toks = docs.select(col("doc_id"),
        explode(expr(QueriesCommon.toksSql)).as("tok"))
      val tf = toks.filter(col("doc_id") < probeLt)
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfc = toks
        .join(broadcast(tf.select("tok").distinct()), Seq("tok"), "left_semi")
        .groupBy("tok").agg(count_distinct(col("doc_id")).as("df"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val w = tf.join(dfc, "tok").crossJoin(broadcast(n))
        .select(col("doc_id"), col("tok"),
          (col("tf") * log(col("__n").cast("double") / col("df"))).as("w"))
      val a = w.toDF("da", "tok", "wa")
      val b = w.toDF("db", "tok", "wb")
      a.join(b, Seq("tok")).filter(col("da") < col("db"))
        .groupBy("da", "db").agg(sum(col("wa") * col("wb")).as("dot"))
        .count()
    }
    time("tfidf pairs 5k docs, probe 100")(tfidfPairs(d1, 100))
    time("tfidf pairs 50k docs, probe 500")(tfidfPairs(d10, 500))

    // Exact repeated-substring stats (dup spans): gram count grows 10×,
    // but the 10× corpus also makes EVERY gram a duplicate (each doc has
    // 9 replicas), so the holder aggregate's distinct-count work grows
    // 10× while output stays per-doc — the gram-bucket-bounded behavior
    // that holds at 1000×.
    time("dupSpanStats 5k docs")(
      Dedup.dupSpanStats(d1, "doc_id", "text", 8).count())
    time("dupSpanStats 50k docs")(
      Dedup.dupSpanStats(d10, "doc_id", "text", 8).count())

    // Corpus reshaping: chunking is map-only (explode of a computed
    // sequence — should scale ~linearly with docs); packing is one
    // per-source window cumsum (source cardinality fixed, rows/key ×10).
    time("chunk 5k docs")(graft.QueriesExt8.chunk(d1, 32, 24).count())
    time("chunk 50k docs")(graft.QueriesExt8.chunk(d10, 32, 24).count())
    time("pack 50k docs")(graft.QueriesExt8.pack(d10, 512).count())

    // Winnowing fingerprints: per-doc window-min — one exchange on
    // doc_id, rows/doc constant, so the decade should be ~linear.
    time("winnow 5k docs")(
      Dedup.winnowFingerprints(d1, "doc_id", "text", 3, 4).count())
    time("winnow 50k docs")(
      Dedup.winnowFingerprints(d10, "doc_id", "text", 3, 4).count())
    spark.stop()
  }
}
