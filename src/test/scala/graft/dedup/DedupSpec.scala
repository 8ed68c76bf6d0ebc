package graft.dedup

import graft.SparkSpec
import graft.similarity.{Knn, Lsh}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content about spark engines"),
      (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (5L, "spark engines process completely different content")
    ).toDF("doc_id", "text")
  }

  test("exactGroups: dup docs share fp, min id wins") {
    val g = Dedup.exactGroups(docs, "doc_id", md5(col("text"))).collect()
    assert(g.length == 4) // 1&4 collapse
    val dupGroup = g.find(_.getAs[Long]("n") == 2L).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
  }

  test("ngramJaccardPairs finds near-dup pair 1-2 and exact pair 1-4") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 3, dfCap = 10, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L && a != 5L })
  }

  test("minhashLshPairs: exact dups get est_jaccard 1.0") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleK = 3, sigLen = 32, bands = 8, estThreshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((1L, 4L)).contains(1.0))
  }

  test("minhash intermediates are not left cached (ADVICE r1 leak)") {
    // isolate from suites that DELIBERATELY persist on the shared
    // session (the curation dedup barrier): this asserts minhash
    // leaves nothing behind, not that no other component ever caches
    spark.catalog.clearCache()
    Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.5).count()
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.name == null)
    // only the localCheckpoint result block may remain, never the
    // signature/shingle intermediates (they'd show as persisted RDDs
    // from the cache operator)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("bandedHammingPairs equals brute force, including high-bit diffs") {
    import spark.implicits._
    val base = 0x5A5A5A5A5A5A5A5AL
    val fixed = Seq(
      1L -> base,
      2L -> (base ^ (1L << 63)), // differs ONLY in the top bit — the
                                 // single-block heuristic would miss it
      3L -> (base ^ 0x7L),       // hamming 3 at the low end
      4L -> ~base)               // hamming 64 — never a pair
    val rnd = new scala.util.Random(11)
    val rows = fixed ++ (5L to 40L).map(i => i -> rnd.nextLong())
    val df = rows.toDF("doc_id", "fp")
    for (maxH <- Seq(0, 3, 8)) {
      val got = Dedup.bandedHammingPairs(df, "doc_id", "fp", maxH)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          r.getAs[Number](2).longValue())).toMap
      val expected = (for {
        (ia, ha) <- rows; (ib, hb) <- rows
        if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= maxH
      } yield ((ia, ib), java.lang.Long.bitCount(ha ^ hb).toLong)).toMap
      assert(got == expected, s"maxHamming=$maxH")
    }
  }

  test("exactCosinePairs equals brute force for every block count") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "v")
    val rows = vecs.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val expected = (for {
      (ia, va) <- rows; (ib, vb) <- rows
      if ia < ib && cos(va, vb) >= 0.3
    } yield (ia, ib)).toSet
    for (blocks <- Seq(1, 3, 8)) {
      val got = Dedup.exactCosinePairs(vecs, "vec_id", "v", 0.3, blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // every pair exactly once (tile scheme never duplicates), and
      // exactly the brute-force set (never loses a cross-block pair)
      assert(got.length == got.toSet.size, s"dup pairs at blocks=$blocks")
      assert(got.toSet == expected, s"pair set mismatch at blocks=$blocks")
    }
  }

  test("blocksForTileBudget keeps per-block rows at the budget") {
    assert(Dedup.blocksForTileBudget(0) == 1)
    assert(Dedup.blocksForTileBudget(999, 1000) == 1)
    assert(Dedup.blocksForTileBudget(1000, 1000) == 1)
    assert(Dedup.blocksForTileBudget(1001, 1000) == 2)
    // blocks ∝ n: the decade multiplies blocks, not per-tile rows
    assert(Dedup.blocksForTileBudget(50000, 1000) ==
      10 * Dedup.blocksForTileBudget(5000, 1000))
    assert(Dedup.blocksForTileBudget(Long.MaxValue, 1) == Int.MaxValue)
    intercept[IllegalArgumentException](Dedup.blocksForTileBudget(5, 0))
  }

  test("exactCosinePairs plans as an equi-join, never cartesian/BNLJ") {
    import spark.implicits._
    val vecs = (1L to 10L).map(i => (i, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "v")
    val plan = Dedup.exactCosinePairs(vecs, "vec_id", "v", 0.5, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("minhash aggregate kernel equals the column-expression formulation") {
    import graft.functions.{TextFunctions => TF}
    val viaExpr = docs.select(col("doc_id"),
        TF.minhashSignature(TF.wordShingles(col("text"), 3), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaKernel = Dedup.minhashSignatures(docs, "doc_id", "text",
        shingleK = 3, sigLen = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr == viaKernel)
  }

  test("hashed shingle rows match string shingle rows hashed in SQL") {
    val viaString = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaKernel = Dedup.shingleHashRows(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaString == viaKernel)
  }

  test("simhash kernel equals the column-expression formulation bit-for-bit") {
    import graft.functions.{TextFunctions => TF}
    val viaExpr = docs.select(col("doc_id"), TF.simhash64(col("text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaKernel = Dedup.simhashes(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaKernel)
    // empty/whitespace text → simhash 0 in both
    import spark.implicits._
    val edge = Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text")
    assert(Dedup.simhashes(edge, "doc_id", "text")
      .collect().forall(_.getLong(1) == 0L))
  }

  test("contaminationPairs flags docs sharing >= minShared shingles with probes") {
    import spark.implicits._
    val probes = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("pid", "ptext")
    val hits = Dedup.contaminationPairs(docs, "doc_id", "text",
        probes, "pid", "ptext", k = 3, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 1 and 4 are exact copies of the probe; 2 shares most shingles
    assert(hits.contains((1L, 100L)) && hits.contains((4L, 100L)))
    assert(!hits.exists(_._1 == 3L))
  }

  test("simhashPairs: exact dups at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      blockBits = 4, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 4L)).contains(0))
  }

  test("embeddingNearDupPairs scores same-bucket duplicate vectors") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      planes = 2, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("bruteForceTopK returns k best by cosine, excluding self") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = Knn.bruteForceTopK(q, vecs, 2).collect()
      .map(r => r.getAs[Long]("vec_id"))
    assert(top.toSeq == Seq(1L, 3L)) // by descending cosine to (1,0)
  }

  test("lshTopK agrees with brute force for identical vectors") {
    import spark.implicits._
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val ann = Knn.lshTopK(q, vecs, planes = 2, k = 3).collect()
    // every returned neighbor must share the query's bucket → sim defined
    assert(ann.nonEmpty && ann.forall(!_.isNullAt(2)))
  }

  test("hyperplaneBucketFast yields the SAME buckets as the HOF formulation") {
    import spark.implicits._
    val vecs = (0L until 50L).map(i =>
      (i, Array.tabulate(16)(j => (math.sin(i * 16 + j) * 2).toFloat))).toDF("id", "v")
    val pm = Lsh.planeMatrix(spark, 6, 16)
    val slow = vecs.select(Lsh.hyperplaneBucket(col("v"), 6)).collect().map(_.getLong(0))
    val fast = vecs.select(Lsh.hyperplaneBucketFast(col("v"), pm)).collect().map(_.getLong(0))
    assert(slow.sameElements(fast))
  }

  test("Lsh buckets are deterministic across invocations") {
    import spark.implicits._
    val vecs = (0L until 10L).map(i =>
      (i, Array.tabulate(4)(j => math.cos(i + j).toFloat))).toDF("id", "v")
    val b1 = vecs.select(Lsh.hyperplaneBucket(col("v"), 4)).collect().map(_.getLong(0))
    val b2 = vecs.select(Lsh.hyperplaneBucket(col("v"), 4)).collect().map(_.getLong(0))
    assert(b1.sameElements(b2))
  }

  test("q_semdedup keeps the min id of every within-bucket near-dup group") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q_semdedup")(spark, dir)
    val kept = out.select("vec_id").collect().map(_.getLong(0)).toSet
    // survivors are a strict, non-empty subset (the synthetic corpus
    // carries ≥0.25-cosine neighbors — q_neardup_exact proves that)
    val total = emb.count()
    assert(kept.nonEmpty && kept.size < total,
      s"semdedup dropped nothing (kept ${kept.size} of $total)")
    // the minimum vec_id can never be dropped: it has no lower-id mate
    val minId = emb.agg(min("vec_id")).collect().head.getLong(0)
    assert(kept.contains(minId))
    // every dropped vector has a KEPT lower-id bucket-mate within the
    // threshold... or a dropped one, transitively — verify the direct
    // SemDeDup invariant instead: no two kept vectors in one bucket
    // are >= 0.25 cosine with the lower id first
    val b = out.join(emb.select("vec_id", "embedding"), "vec_id")
    val viol = b.toDF("ia", "ba", "va")
      .join(b.toDF("ib", "bb", "vb"), col("ba") === col("bb"))
      .filter(col("ia") < col("ib"))
      .filter(graft.functions.VectorFunctions.cosineSimilarity(
        col("va"), col("vb")) >= 0.25)
      .count()
    assert(viol == 0, s"$viol kept pairs still within threshold in-bucket")
  }

  test("graft.dedup.checkpointDir switches materialization to a reliable checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // baseline result on the default (localCheckpoint) path
    val base = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleK = 3, sigLen = 32, bands = 8, estThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("graft.dedup.checkpointDir", dir)
    try {
      val rel = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleK = 3, sigLen = 32, bands = 8, estThreshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rel == base, "reliable-checkpoint path changed the result")
      // the reliable checkpoint must actually have written RDD state
      // into the configured fault-tolerant directory
      def files(p: java.io.File): Seq[java.io.File] = {
        val kids = Option(p.listFiles()).map(_.toSeq).getOrElse(Nil)
        kids ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).exists(_.isFile),
        s"no checkpoint files under $dir")
      // the star rounds honor the same flag: force the distributed
      // path so connectedComponents' per-round checkpoint runs
      val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, dfCap = 10, threshold = 0.3)
      val comp = DupClusters.connectedComponents(edges, "doc_a", "doc_b",
        localEdgeThreshold = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.unset("graft.dedup.checkpointDir")
      val compBase = DupClusters.connectedComponents(edges, "doc_a", "doc_b",
        localEdgeThreshold = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(comp == compBase,
        "reliable-checkpoint star rounds changed the components")
    } finally spark.conf.unset("graft.dedup.checkpointDir")
  }
}
