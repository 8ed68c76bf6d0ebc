package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** At-scale probe for BPE tokenizer induction (`functions/Bpe`): a
  * synthesized corpus with a COMPOSITIONAL vocabulary (syllable
  * triples — ~260k distinct words sharing heavy subword structure, the
  * regime BPE exists for; the driver test tables replicate ~31 words
  * and would make the merge loop degenerate). Measures the three scale
  * claims separately:
  *
  *   1. wordFreq: the ONE corpus-scale pass (nDocs × wordsPerDoc word
  *      instances → vocab-sized table, one exchange);
  *   2. the merge loop on the vocab-scale table only — forced
  *      DISTRIBUTED (collectCap=0, per-merge pair-agg + 1-row collect
  *      + lazy replace) vs the adaptive DRIVER path, merge sequences
  *      asserted EQUAL;
  *   3. encode: vocab tokenized once (numMerges nested replaces),
  *      corpus re-pass as a broadcast join — no corpus-side shuffle.
  *
  * Usage: tools/run_main.sh graft.tools.BpeProbe
  *        [nDocs] [wordsPerDoc] [merges] (defaults 2,000,000 × 40, 48).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val wpd = args.lift(1).map(_.toInt).getOrElse(40)
    val merges = args.lift(2).map(_.toInt).getOrElse(48)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Bpe

    // 64 two-letter syllables; word(w) = syl[w%64]+syl[w/64%64]+syl[w/4096%64]
    val syls = for (a <- "ktmnsrlp"; b <- "aeiouywz") yield s"$a$b"
    val sylArr = syls.map(s => s"'$s'").mkString("array(", ",", ")")
    def wordSql(idx: String): String =
      s"element_at($sylArr, cast(pmod($idx, 64) AS int) + 1) || " +
        s"element_at($sylArr, cast(pmod($idx div 64, 64) AS int) + 1) || " +
        s"element_at($sylArr, cast(pmod($idx div 4096, 64) AS int) + 1)"
    // Zipf-ish skew: word index = a multiplicative hash squared down
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        expr(s"""array_join(transform(sequence(1, $wpd), j ->
            ${wordSql(s"pmod(id * j * 2654435761, 262144)")}), ' ')""")
          .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // materialize: time BPE, not the generator

    def tsec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val words = Bpe.wordFreq(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (v, tWf) = tsec(words.count())
    println(f"wordFreq: $tWf%.2f s ($nDocs docs x $wpd words -> $v distinct)")

    val (distMerges, tDist) = tsec(
      Bpe.learn(words, merges, collectCap = 0L))
    println(f"learn distributed: $tDist%.2f s for $merges merges " +
      f"(${tDist / merges}%.3f s/merge, on the $v-word table only)")

    val (drvMerges, tDrv) = tsec(Bpe.learn(words, merges))
    println(f"learn driver (adaptive): $tDrv%.2f s")
    require(distMerges == drvMerges,
      s"paths disagree:\n$distMerges\nvs\n$drvMerges")
    println(s"paths agree on all ${distMerges.size} merges; " +
      s"top: ${distMerges.take(5).map(m => m.left + "+" + m.right).mkString(", ")}")

    val (tok, tEnc) = tsec(
      Bpe.docTokenCounts(docs, "text", Seq("doc_id"), distMerges, words)
        .agg(sum("n_tokens"), sum("n_words")).collect().head)
    println(f"encode (vocab-join): $tEnc%.2f s -> " +
      s"${tok.getLong(0)} tokens / ${tok.getLong(1)} words " +
      f"(${tok.getLong(0).toDouble / tok.getLong(1)}%.2f tok/word)")
    spark.stop()
  }
}
