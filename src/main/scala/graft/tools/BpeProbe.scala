package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** At-scale probe for BPE tokenizer induction (`functions/Bpe`): a
  * synthesized corpus with a COMPOSITIONAL vocabulary (syllable
  * k-tuples — up to 64^k distinct words sharing heavy subword
  * structure, the regime BPE exists for; the driver test tables
  * replicate ~31 words and would make the merge loop degenerate).
  * Measures the scale claims separately:
  *
  *   1. wordFreq: the ONE corpus-scale pass (nDocs × wordsPerDoc word
  *      instances → vocab-sized table, one exchange);
  *   2. the merge loop on the vocab-scale table only — the STREAMED
  *      incremental driver trainer (`learnIncremental`: heap +
  *      occurrence index, O(occurrences) per merge) at production
  *      merge counts, with the DISTRIBUTED fallback run for a prefix
  *      of the merges and asserted EQUAL to the driver sequence's
  *      prefix (full-length distributed is serial-round-bound by
  *      design — that being the reason the driver trainer exists);
  *   3. encode, both production forms: (a) vocab tokenized ONCE with
  *      the fast kernel + corpus broadcast join (`docTokenCounts` —
  *      no corpus-side shuffle), and (b) the map-only codegen'd
  *      kernel column (`docTokenCountFastCol` — the CLI/streaming
  *      form, no join at all), asserted to agree on total tokens.
  *
  *   4. (r15) TOKEN-ID EMISSION at the same point — the map-only
  *      `docTokenIdsFast` kernel (id table = alphabet + merges rows,
  *      constant-sized) over the full corpus, with an order-sensitive
  *      checksum asserted EQUAL to the join form's (which at this
  *      vocab size-routes to a plain shuffle join — the multi-GB
  *      forced broadcast of r14 is structurally gone; the probe also
  *      greps both executed plans and reports their exchange shapes).
  *
  * Usage: tools/run_main.sh graft.tools.BpeProbe
  *        [nDocs] [wordsPerDoc] [merges] [sylPerWord] [distPrefix]
  *        [minFreqDemo(0|1)]
  *        (defaults 2,000,000 × 40, 48 merges, 3 syllables, prefix 48;
  *        the r14 production point: 2000000 40 32768 4 48 — a 16.7M-slot
  *        vocabulary, ≥10⁷ distinct observed, 32k merges).
  *
  * minFreqDemo=1 runs a SEPARATE xxhash64-worded corpus with a
  * 1.07B-slot vocabulary (sylPerWord=5): ~77M distinct observed —
  * past collectCap, the regime the r14 verdict flagged — and shows
  * `minFreq=2` pruning the once-seen tail back under the driver
  * trainer's cap (the SentencePiece/HF min_frequency recipe at
  * 100 TB-vocabulary scale).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val wpd = args.lift(1).map(_.toInt).getOrElse(40)
    val merges = args.lift(2).map(_.toInt).getOrElse(48)
    val sylPerWord = args.lift(3).map(_.toInt).getOrElse(3)
    val distPrefix = args.lift(4).map(_.toInt).getOrElse(48)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Bpe

    // 64 two-letter syllables; word(w) = k base-64 digits of w, each a
    // syllable — 64^k word slots with maximal shared subword structure
    val syls = for (a <- "ktmnsrlp"; b <- "aeiouywz") yield s"$a$b"
    val sylArr = syls.map(s => s"'$s'").mkString("array(", ",", ")")
    val slots = math.pow(64, sylPerWord).toLong
    def wordSql(idx: String): String =
      (0 until sylPerWord).map { k =>
        val shifted = if (k == 0) idx else s"($idx) div ${1L << (6 * k)}"
        s"element_at($sylArr, cast(pmod($shifted, 64) AS int) + 1)"
      }.mkString(" || ")
    // Zipf-ish skew: word index = a multiplicative hash squashed down
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        expr(s"""array_join(transform(sequence(1, $wpd), j ->
            ${wordSql(s"pmod(id * j * 2654435761, $slots)")}), ' ')""")
          .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // materialize: time BPE, not the generator

    def tsec[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val words = Bpe.wordFreq(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (v, tWf) = tsec(words.count())
    println(f"wordFreq: $tWf%.2f s ($nDocs docs x $wpd words -> " +
      s"$v distinct of $slots slots)")

    val (drvMerges, tDrv) = tsec(Bpe.learn(words, merges))
    println(f"learn driver (streamed incremental): $tDrv%.2f s for " +
      f"$merges merges (${tDrv / merges * 1000}%.2f ms/merge over the " +
      s"$v-word table)")

    if (distPrefix > 0) {
      val (distMerges, tDist) = tsec(
        Bpe.learn(words, math.min(distPrefix, merges), collectCap = 0L))
      println(f"learn distributed fallback: $tDist%.2f s for " +
        f"${distMerges.size} merges (${tDist / distMerges.size}%.3f s/merge " +
        "-- the serial-round shape the driver trainer replaces)")
      require(drvMerges.take(distMerges.size) == distMerges,
        s"paths disagree on the shared prefix:\n${distMerges.take(8)}\nvs\n" +
          s"${drvMerges.take(8)}")
      println(s"paths agree on the shared ${distMerges.size}-merge prefix; " +
        s"top: ${drvMerges.take(5).map(m => m.left + "+" + m.right).mkString(", ")}")
    }
    println(s"deepest merge: len ${drvMerges.map(m => (m.left + m.right).length).max}, " +
      s"last: ${drvMerges.takeRight(3).map(m => m.left + "+" + m.right).mkString(", ")}")

    val (tok, tEnc) = tsec(
      Bpe.docTokenCounts(docs, "text", Seq("doc_id"), drvMerges, words)
        .agg(sum("n_tokens"), sum("n_words")).collect().head)
    val totTok = tok.getLong(0)
    println(f"encode (fast-kernel vocab + broadcast join): $tEnc%.2f s -> " +
      s"$totTok tokens / ${tok.getLong(1)} words " +
      f"(${totTok.toDouble / tok.getLong(1)}%.2f tok/word, " +
      f"${totTok / tEnc / 1e6}%.1f M tok/s)")

    val (tok2, tEnc2) = tsec(
      docs.select(Bpe.docTokenCountFastCol(col("text"), drvMerges).as("n"))
        .agg(sum("n")).collect().head.getLong(0))
    println(f"encode (map-only codegen kernel column): $tEnc2%.2f s -> " +
      f"$tok2 tokens (${tok2 / tEnc2 / 1e6}%.1f M tok/s)")
    require(tok2 == totTok,
      s"kernel column total $tok2 != vocab-join total $totTok")
    println("encode forms agree on total tokens")

    // ---- token-ID emission (r15): kernel vs size-routed join form ----
    val (idRows, tIdTab) = tsec(Bpe.vocabIds(words, drvMerges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
    println(f"id table: ${idRows.length} rows (alphabet + merges; " +
      f"derived in $tIdTab%.2f s) -- the ONLY ride-along state of the kernel")

    val kernelDf = Bpe
      .docTokenIdsFast(docs, "text", Seq("doc_id"), drvMerges, idRows)
      .select(col("doc_id"), posexplode(col("token_ids")).as(Seq("p", "id")))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("ids"),
        sum(col("id") * (col("p") + 1)).as("flat"))
    val kPlan = kernelDf.queryExecution.executedPlan.toString
    val kBc = kPlan.linesIterator.count(_.contains("BroadcastExchange"))
    val (kRow, tK) = tsec(kernelDf.collect().head)
    println(f"id emission (map-only kernel): $tK%.2f s -> ${kRow.getLong(0)} " +
      f"ids (${kRow.getLong(0) / tK / 1e6}%.1f M ids/s); executed plan has " +
      s"$kBc BroadcastExchange nodes")
    require(kBc == 0, "kernel id emission must not broadcast anything")

    val joinLong = Bpe.docTokenIdsLong(docs, "text", Seq("doc_id"),
      drvMerges, words)
    val jPlanned = joinLong.queryExecution.executedPlan.toString
    val jBc = jPlanned.linesIterator.count(_.contains("BroadcastExchange"))
    val joinAgg = joinLong
      .withColumn("fp1", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy("word_pos", "tok_pos")))
      .agg(count(lit(1)).as("n"), sum(col("token_id")).as("ids"),
        sum(col("token_id") * col("fp1")).as("flat"))
    val (jRow, tJ) = tsec(joinAgg.collect().head)
    println(f"id emission (join form, size-routed): $tJ%.2f s " +
      s"(plan has $jBc BroadcastExchange nodes -- " +
      s"${if (jBc <= 1) "the constant-sized id table only; the word vocab " +
           "routed to a plain shuffle join past VocabBroadcastCap"
         else "id table AND word vocab (small-vocab broadcast regime)"})")
    require((kRow.getLong(0), kRow.getLong(1), kRow.getLong(2)) ==
        ((jRow.getLong(0), jRow.getLong(1), jRow.getLong(2))),
      s"kernel/join id checksums diverged: $kRow vs $jRow")
    println("id emission forms agree on (count, id sum, order-sensitive sum)")

    // ---- minFreq demo: a past-collectCap vocab pruned under the cap ----
    if (args.lift(5).exists(_ == "1")) {
      docs.unpersist(false)
      val slots5 = math.pow(64, 5).toLong
      def w5(idx: String): String =
        (0 until 5).map { k =>
          val shifted = if (k == 0) idx else s"($idx) div ${1L << (6 * k)}"
          s"element_at($sylArr, cast(pmod($shifted, 64) AS int) + 1)"
        }.mkString(" || ")
      val noisy = spark.range(nDocs)
        .select(col("id").as("doc_id"),
          expr(s"""array_join(transform(sequence(1, $wpd), j ->
              ${w5(s"pmod(xxhash64(id, j), $slots5)")}), ' ')""").as("text"))
      val wf5 = Bpe.wordFreq(noisy, "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (v5, tWf5) = tsec(wf5.count())
      val kept = wf5.filter(col("freq") >= 2).count()
      println(f"minFreq demo: $tWf5%.2f s wordFreq -> $v5 distinct of " +
        s"$slots5 slots (past collectCap ${20000000L}); freq>=2 keeps $kept")
      require(v5 > 20000000L, s"demo vocab must exceed collectCap, got $v5")
      require(kept <= 20000000L, s"pruned vocab must fit the cap, got $kept")
      val (m5, t5) = tsec(Bpe.learn(wf5, 512, minFreq = 2L))
      println(f"learn minFreq=2 (driver incremental route): $t5%.2f s for " +
        f"${m5.size} merges (${t5 / m5.size * 1000}%.2f ms/merge) -- " +
        "without the prune this vocab would fall to the distributed loop")
      wf5.unpersist(false)
    }
    spark.stop()
  }
}
