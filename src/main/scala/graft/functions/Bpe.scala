package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer INDUCTION at corpus scale — learn a
  * BPE merge table from the corpus itself (Sennrich et al. 2016, the
  * GPT-2/SentencePiece training recipe) and tokenize with it. The
  * missing half of the token-counting story: `TextFunctions` counts
  * whitespace/regex tokens, but a training pipeline's token budget is
  * denominated in the TOKENIZER'S units, and the tokenizer is itself a
  * corpus-scale artifact.
  *
  * The scale shape (the whole point):
  *
  *   1. corpus → word-frequency table: the ONE corpus-scale pass (a
  *      single exchange keyed by word). Everything after runs on the
  *      vocab-scale table — for a 100 TB corpus the distinct-word table
  *      is ~10⁷ rows, i.e. 10⁵× smaller.
  *   2. merge loop, on the word table only: per merge, one small
  *      pair-count aggregation + a 1-row driver collect (the argmax
  *      pair) + one codegen'd string `replace`. Below `collectCap`
  *      distinct words the loop runs on the driver over the collected
  *      table instead — the same adaptive-finisher pattern as
  *      `DupClusters`' union-find (identical semantics, spec-pinned) —
  *      because numMerges scheduler rounds dwarf the arithmetic at
  *      test scale.
  *   3. encode: tokenize the VOCAB once (numMerges nested codegen'd
  *      replaces over the word table), then corpus token counts are a
  *      broadcast join — zero corpus-side shuffle. (`tokenCountCol` is
  *      the join-free per-row alternative; right when numMerges is
  *      small, wrong at vocab-sized merge tables.)
  *
  * Merge application is EXACTLY canonical BPE (leftmost-first,
  * non-overlapping, one pass per merge rank) via a string encoding
  * that makes one merge one `replace` call: a word's symbol sequence
  * is SEP-wrapped and DOUBLE-SEP-joined — "abc" ⇒ ·a··b··c· (· =
  * U+0001). A merge (l, r) is then `replace(sw, "·l··r·", "·lr·")`:
  * the single seps at the pattern's edges can only match a symbol
  * BOUNDARY (symbols never contain SEP), so a pattern can never match
  * across partial symbols — merging (a,b) cannot fire on ["xa","bx"] —
  * and because adjacent occurrences do NOT share boundary characters
  * (the inter-symbol gap is two seps, the pattern consumes one from
  * each side), left-to-right non-overlapping `replace` visits every
  * eligible pair exactly like the reference merge loop: [a,b,a,b] ⇒
  * [ab,ab], [a,a,a] ⇒ [aa,a]. `StringReplace` is codegen'd, and the
  * identical call exists in every SQL engine — which is what makes the
  * WHOLE learn loop (not just pair stats) DuckDB-oracle-checkable
  * (q_bpe_learn_oracle / q_bpe_encode).
  *
  * Tie-breaks everywhere: pair count DESC, then (left, right) ASC by
  * binary string order — deterministic and engine-neutral.
  *
  * Reference scope: vector-io has no tokenizer; this is the
  * beyond-parity training-data layer (SURVEY §7.5), feeding the token
  * budget / packing stages (`ops/Mixture`, `pipeline/Curation`) with
  * learned-subword counts instead of whitespace counts.
  */
object Bpe {

  /** Symbol boundary, U+0001 — must not occur in input words; wordFreq
    * filters such words out (and the oracle SQL does the same). */
  val Sep = "\u0001"
  private val Sep2 = Sep + Sep

  /** One learned merge: rank (1-based, application order), the two
    * symbols joined, and the pair's weighted frequency at learn time. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Corpus → (word, freq): THE corpus-scale pass (one exchange, with
    * map-side partial counts). Whitespace pre-tokenization; empty and
    * SEP-containing words are dropped on both the Spark and oracle
    * sides. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "" && !col("word").contains(Sep))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** ·c1··c2··…·cn· — the wrapped symbol string of a word. */
  def wrapCol(w: Column): Column =
    concat(lit(Sep), array_join(split(w, ""), Sep2), lit(Sep))

  /** Symbols of a wrapped string: strip the outer seps, split on the
    * double-sep gaps. (U+0001 is not a regex metacharacter, so the
    * literal is safe as `split`'s pattern.) */
  def symbolsCol(sw: Column): Column =
    split(sw.substr(lit(2), length(sw) - 2), Sep2)

  /** Apply a learned merge table to a word: numMerges nested codegen'd
    * replaces, in rank order — pure map-side compute. */
  def applyMergesCol(w: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(wrapCol(w)) { (c, m) =>
      org.apache.spark.sql.functions.replace(c,
        lit(Sep + m.left + Sep2 + m.right + Sep),
        lit(Sep + m.left + m.right + Sep))
    }

  /** BPE tokens of a word under a merge table. */
  def tokensCol(w: Column, merges: Seq[Merge]): Column =
    symbolsCol(applyMergesCol(w, merges))

  /** BPE token count of a word under a merge table (join-free form;
    * see `tokenizeVocab` for the broadcast-join form that tokenizes
    * each distinct word once). */
  def tokenCountCol(w: Column, merges: Seq[Merge]): Column =
    size(tokensCol(w, merges))

  /** Whole-document BPE token count as ONE pure column — no explode,
    * no join: the sum over the doc's words of each word's token count
    * (same empty/SEP word filters as `wordFreq`). Higher-order
    * functions evaluate interpreted, so this is the right form when
    * the merge table is small or a join is unwelcome (a streaming
    * micro-batch, a quality filter that must stay map-only);
    * `docTokenCounts`' broadcast-vocab join is the right form at
    * vocab-sized merge tables. */
  def docTokenCountCol(text: Column, merges: Seq[Merge]): Column = {
    val words = org.apache.spark.sql.functions.filter(
      split(trim(text), "\\s+"),
      w => w =!= lit("") && !w.contains(Sep))
    aggregate(words, lit(0L), (acc, w) => acc + tokenCountCol(w, merges))
  }

  /** (word, n_tok): the vocab tokenized ONCE under the merge table —
    * broadcast this against exploded corpus words so the corpus pays a
    * hash probe per word instead of numMerges replaces per occurrence. */
  def tokenizeVocab(words: DataFrame, merges: Seq[Merge]): DataFrame =
    words.select(col("word"),
      tokenCountCol(col("word"), merges).cast("long").as("n_tok"))

  /** Per-document BPE token counts: explode words (map-side), probe the
    * broadcast tokenized vocab, re-aggregate by document — the corpus
    * is scanned once and shuffled only as (doc key, partial count). */
  def docTokenCounts(docs: DataFrame, textCol: String, keyCols: Seq[String],
      merges: Seq[Merge], words: DataFrame): DataFrame = {
    val vocab = tokenizeVocab(words, merges)
    val dw = docs.select(keyCols.map(col) :+
        explode(split(trim(col(textCol)), "\\s+")).as("word"): _*)
      .filter(col("word") =!= "" && !col("word").contains(Sep))
    dw.join(broadcast(vocab), Seq("word"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
  }

  /** Learn `numMerges` merges from a (word, freq) table. Adaptive like
    * `DupClusters.connectedComponents`' driver finisher: at or below
    * `collectCap` distinct words the loop runs in memory on the driver
    * (1 collect job total — numMerges×2 scheduler rounds matter more
    * than the arithmetic at that size); above it, distributed (per
    * merge: one pair-count aggregation + 1-row collect + one lazy
    * `replace`, with a `localCheckpoint` every `checkpointEvery` merges
    * to stop lineage/recompute growing quadratically in numMerges).
    * Both paths implement the identical canonical-BPE semantics and
    * tie-breaks; BpeSpec pins them equal on the same input. */
  def learn(words: DataFrame, numMerges: Int,
      collectCap: Long = 2000000L, checkpointEvery: Int = 16): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    if (numMerges == 0) return Seq.empty
    val n = words.count()
    if (n <= collectCap) {
      learnInMemory(words.select(col("word"), col("freq").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))), numMerges)
    } else learnDistributed(words, numMerges, checkpointEvery)
  }

  /** The driver loop — reference-shaped BPE over symbol arrays
    * (leftmost-first non-overlapping application, the same semantics
    * the wrapped-string `replace` encodes). */
  private[functions] def learnInMemory(wf: Array[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      wf.map { case (w, f) => (w.split("").filter(_.nonEmpty), f) }
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pc = new scala.collection.mutable.HashMap[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, r), cnt) = pc.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(rank, l, r, cnt)
        words = words.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** The distributed loop — identical semantics on the wrapped-string
    * form. State is only ever the (sw, freq) word table. */
  private[functions] def learnDistributed(words: DataFrame, numMerges: Int,
      checkpointEvery: Int): Seq[Merge] = {
    var cur = words.select(wrapCol(col("word")).as("sw"),
      col("freq").cast("long").as("freq"))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val syms = symbolsCol(col("sw"))
      val top = cur
        .select(explode(zip_with(
            slice(syms, lit(1), size(syms) - 1),
            slice(syms, lit(2), size(syms) - 1),
            (l, r) => struct(l.as("l"), r.as("r")))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        cur = cur.withColumn("sw",
          org.apache.spark.sql.functions.replace(col("sw"),
            lit(Sep + l + Sep2 + r + Sep), lit(Sep + l + r + Sep)))
        if (rank % checkpointEvery == 0) cur = cur.localCheckpoint(true)
        rank += 1
      }
    }
    merges.result()
  }
}
