package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Volume probe for PACKED training-shard emission (`Bpe.packTokenIds`,
  * r15): the full id pipeline — learn, map-only id emission, pack —
  * at the 2M-document point, measuring the SLICE-exchange shape the
  * r15 rework introduced: each document contributes one shuffle row
  * per COVERED SHARD (an array slice of its id stream), not one row
  * per token id, so the pack exchange carries doc-shard incidences.
  * The probe prints the measured incidence count next to the total id
  * count — the ratio IS the shuffle-row saving (~tokens-per-doc×) and
  * grows with corpus scale, which is what makes the slice form the
  * 100 TB shape (an id-per-row exchange at a trillion tokens is 10¹²
  * shuffle rows of per-row overhead for the same payload bytes).
  *
  * Also timed: the epoch-shuffled variant (`shuffleSeed` — only the
  * window sort key changes; the slicing and exchange are identical),
  * asserted to conserve (shard count, total ids) per source.
  *
  * Usage: tools/run_main.sh graft.tools.PackProbe
  *        [nDocs] [wordsPerDoc] [merges] [seqLen]
  *        (defaults 2,000,000 × 40, 48 merges, seqLen 2048;
  *        SPARK_DRIVER_MEM=24g is plenty).
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val wpd = args.lift(1).map(_.toInt).getOrElse(40)
    val nMerges = args.lift(2).map(_.toInt).getOrElse(48)
    val seqLen = args.lift(3).map(_.toInt).getOrElse(2048)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tsec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // 3-syllable xxhash64-mixed words, 16 sources — enough window
    // partitions that the per-source cumsum parallelizes
    val syls = (for (a <- "ktmnsrlp"; b <- "aeiouywz") yield s"$a$b")
      .map(s => s"'$s'").mkString("array(", ",", ")")
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        expr("concat('src', cast(pmod(id, 16) AS int))").as("source"),
        expr(s"""array_join(transform(sequence(1, $wpd), j -> concat(
            element_at($syls, cast(pmod(xxhash64(id, j), 64) AS int) + 1),
            element_at($syls, cast(pmod(xxhash64(id, j) div 64, 64) AS int) + 1),
            element_at($syls, cast(pmod(xxhash64(id, j) div 4096, 64) AS int) + 1))),
          ' ')""").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"# pack probe: $nDocs docs x $wpd words, $nMerges merges, " +
      s"seqLen $seqLen, 16 sources")

    val words = Bpe.wordFreq(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (merges, tLearn) = tsec(Bpe.learn(words, nMerges))
    val (idRows, tIds) = tsec(Bpe.vocabIds(words, merges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
    println(f"learn: $tLearn%.1f s for ${merges.size} merges; id table " +
      f"${idRows.length} rows in $tIds%.1f s")

    val perDoc = Bpe
      .docTokenIdsFast(docs, "text", Seq("source", "doc_id"), merges, idRows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (tot, tEmit) = tsec(
      perDoc.agg(count(lit(1)), sum("n_tokens")).head())
    val (nD, nIds) = (tot.getLong(0), tot.getLong(1))
    println(f"id emission (map-only kernel): $tEmit%.1f s -> $nIds ids over " +
      f"$nD docs (${nIds.toDouble / nD}%.1f ids/doc)")

    // the slice-exchange cardinality: doc-shard incidences (what the
    // pack exchange actually shuffles) vs total ids (what the
    // id-per-row form would have shuffled)
    def packed(seed: Option[String]) =
      Bpe.packTokenIds(perDoc, "source", "doc_id", seqLen, -2L, seed)
    val (summary, tPack) = tsec(
      packed(None).agg(count(lit(1)).as("shards"), sum("n_ids").as("ids"))
        .head())
    val nShards = summary.getLong(0)
    val nPacked = summary.getLong(1)
    // upper bound: every doc is one slice row, plus at most one extra
    // per shard boundary a doc spans
    val incidences = nD + nShards
    println(f"pack (document order): $tPack%.1f s -> $nShards shards of " +
      f"$seqLen, $nPacked ids (corpus + EOS markers); exchange rows " +
      f"<= $incidences incidences vs $nPacked id rows = " +
      f">=${nPacked.toDouble / incidences}%.0fx fewer shuffle rows")
    require(nPacked == nIds + nD, s"stream must be ids + one EOS per doc")

    val (summary2, tPack2) = tsec(
      packed(Some("ep1")).agg(count(lit(1)), sum("n_ids")).head())
    println(f"pack (epoch-shuffled 'ep1'): $tPack2%.1f s -> " +
      f"${summary2.getLong(0)} shards, ${summary2.getLong(1)} ids")
    require(summary2.getLong(0) == nShards && summary2.getLong(1) == nPacked,
      "epoch shuffle must conserve shard count and id totals")
    println("epoch shuffle conserves (shards, ids); only the layout changes")
    spark.stop()
  }
}
