package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{TextFunctions => TF}

/** Document-deduplication operators for training-data pipelines.
  *
  * Not present in the reference (vector-io has only id-set algebra,
  * `scripts/get_id_list.py`); these are the beyond-parity operators the
  * rebuild adds (SURVEY §7.5), designed shuffle-consciously:
  *
  *  - exact:   one hash-groupBy (single shuffle on the fingerprint)
  *  - ngram:   inverted index on shingles with a document-frequency cap,
  *             so the self-join never explodes on stop-shingles — the
  *             standard trick that keeps candidate generation linear-ish
  *             at 100 TB instead of O(n²) pairwise
  *  - minhash: signature + banded LSH join (candidates only where a band
  *             collides), est. Jaccard from signature agreement
  *  - simhash: 64-bit fingerprint; near-dups = small Hamming distance
  *             within LSH buckets of the high bits
  */
object Dedup {

  /** Run `body` with `cached` persisted, materialize the (small) result
    * eagerly with a local checkpoint, then release the cached
    * intermediates. Near-dup candidate sets are orders of magnitude
    * smaller than the corpus, so checkpointing the output while freeing
    * the shingle/signature tables is the right storage trade at scale —
    * and repeated calls in a long-lived session no longer accumulate
    * cached blocks. */
  private def withCached(cached: DataFrame*)(body: => DataFrame): DataFrame = {
    cached.foreach(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try body.localCheckpoint(true)
    finally cached.foreach(_.unpersist(false))
  }

  /** Exact dedup: group by content fingerprint; keep the smallest id
    * (deterministic winner), count members. */
  def exactGroups(docs: DataFrame, idCol: String, fp: Column): DataFrame =
    docs.groupBy(fp.as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Rare-shingle Jaccard candidate pairs via inverted index.
    *
    * Shingles with document frequency > dfCap are dropped before the
    * self-join (they carry no discriminative signal and quadratically
    * dominate join cost); Jaccard is computed over the kept shingles.
    * Output: (doc_a, doc_b, jac) for jac >= threshold.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, dfCap: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
        explode(TF.wordShingles(col(textCol), k)).as("sh"))
    val df = sh.groupBy("sh").agg(count(lit(1)).as("c"))
    // kept is reused three times below (self-join both sides + sizes);
    // cached so the shingle explode and df-cap join run once
    val kept = sh.join(df.filter(col("c") <= dfCap), "sh")
      .select("doc_id", "sh")
    withCached(kept) {
      val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val a = kept.toDF("da", "sh")
      val b = kept.toDF("db", "sh")
      val inter = a.join(b, Seq("sh")).filter(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("i"))
      inter
        .join(sizes.toDF("da", "na"), "da")
        .join(sizes.toDF("db", "nb"), "db")
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jac"))
        .filter(col("jac") >= threshold)
    }
  }

  /** MinHash signatures: (id, sig array<long>) from word shingles.
    *
    * Formulated as explode → hash-aggregate with sigLen min(xxhash64)
    * columns rather than a nested higher-order-function expression: the
    * aggregate runs in whole-stage codegen with map-side partial mins,
    * while nested HOFs evaluate interpreted (~100× slower here) — same
    * values either way (TextFunctions.minhashSignature is the
    * column-expression formulation for single-row use). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, sigLen: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(TF.wordShingles(col(textCol), shingleK)).as("sh"))
    val aggs = (0 until sigLen).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until sigLen).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Banded-LSH candidate pairs with estimated Jaccard = fraction of
    * agreeing signature positions. Pairs are generated only where at
    * least one band collides — the scan is linear in corpus size, and
    * the band join shuffles on (band, key), never on raw text. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, sigLen: Int, bands: Int, estThreshold: Double): DataFrame = {
    val rows = sigLen / bands
    // Materialize signatures before the self-join: the signature is an
    // expensive nested expression (per-shingle, per-position hashing),
    // and without a cache both join sides and every exploded band row
    // would recompute it. At cluster scale this is the stage you'd
    // checkpoint to storage; in-memory cache is the local analog.
    val sigs = minhashSignatures(docs, idCol, textCol, shingleK, sigLen)
    withCached(sigs) {
      val banded = sigs.select(col("doc_id"), col("sig"),
        explode(TF.lshBandKeys(col("sig"), bands, rows)).as("bk"))
        .select(col("doc_id"), col("sig"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      val a = banded.toDF("da", "siga", "band", "key")
      val b = banded.toDF("db", "sigb", "band", "key")
      a.join(b, Seq("band", "key")).filter(col("da") < col("db"))
        .select(col("da"), col("db"),
          (size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y),
            bool => bool)).cast("double") / lit(sigLen)).as("est_jaccard"))
        .distinct()
        .filter(col("est_jaccard") >= estThreshold)
        .select(col("da").as("doc_a"), col("db").as("doc_b"), col("est_jaccard"))
    }
  }

  /** SimHash fingerprints: (id, simhash long, hex rendering). */
  def simhashes(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TF.simhash64(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs: block on the top `blockBits` bits (docs
    * differing there can still be caught by a second rotated pass at
    * scale), then filter by Hamming distance <= maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      blockBits: Int, maxHamming: Int): DataFrame = {
    val sh = simhashes(docs, idCol, textCol)
      .withColumn("blk", shiftrightunsigned(col("simhash"), 64 - blockBits))
    val a = sh.toDF("da", "ha", "blk")
    val b = sh.toDF("db", "hb", "blk")
    a.join(b, Seq("blk")).filter(col("da") < col("db"))
      .withColumn("hamming", TF.hamming64(col("ha"), col("hb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("da").as("doc_a"), col("db").as("doc_b"), col("hamming"))
  }

  /** Embedding-cosine near-duplicate pairs, LSH-blocked: vectors are
    * bucketed by the sign pattern of `planes` pseudo-random hyperplane
    * projections (deterministic, derived from xxhash64 of (plane, dim)),
    * and only same-bucket pairs are scored. */
  def embeddingNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      planes: Int, minCosine: Double): DataFrame = {
    import graft.similarity.Lsh
    val bucketed = vecs.select(col(idCol).as("vid"), col(vecCol).as("v"),
      Lsh.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val a = bucketed.toDF("da", "va", "bucket")
    val b = bucketed.toDF("db", "vb", "bucket")
    a.join(b, Seq("bucket")).filter(col("da") < col("db"))
      .withColumn("cosine",
        graft.functions.VectorFunctions.cosineSimilarity(col("va"), col("vb")))
      .filter(col("cosine") >= minCosine)
      .select(col("da").as("id_a"), col("db").as("id_b"), col("cosine"))
  }
}
