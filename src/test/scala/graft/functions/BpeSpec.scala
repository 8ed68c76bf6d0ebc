package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  /** Reference BPE (Sennrich et al. 2016 pseudocode shape): pair
    * counts weighted by word frequency, argmax with (count DESC, left,
    * right) tie-break, leftmost-first non-overlapping application. */
  private def refBpe(wf: Map[String, Long], numMerges: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var words: Map[String, (Seq[String], Long)] =
      wf.map { case (w, f) => w -> (w.split("").filter(_.nonEmpty).toSeq, f) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var stop = false
    while (rank <= numMerges && !stop) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      words.values.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + f)
      }
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), cnt) = pc.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, l, r, cnt))
        words = words.map { case (w, (syms, f)) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> (out.result(), f)
        }
        rank += 1
      }
    }
    (merges.result(), words.map { case (w, (s, _)) => w -> s })
  }

  // A corpus engineered to exercise the hard cases:
  //  - "aaa"/"aaaa": overlapping candidate pairs (leftmost-first rule)
  //  - "xa"/"bx" frequent: later ranks merge (x,a) and (b,x), after
  //    which "xabx" = [xa, bx] must NOT fire a learned (a,b) merge
  //    across the symbol boundary — the false-match trap the doubled
  //    separator encoding exists to prevent
  //  - multi-char symbol merges ((a,b)→ab then (ab,c)→abc)
  private val corpusWf: Map[String, Long] = Map(
    "abab" -> 50L, "abc" -> 40L, "aaa" -> 30L, "aaaa" -> 10L,
    "xa" -> 45L, "bx" -> 45L, "xabx" -> 25L, "b" -> 60L, "cab" -> 15L)

  private def wordsDf = {
    import spark.implicits._
    corpusWf.toSeq.toDF("word", "freq")
  }

  test("learnInMemory matches the reference merge sequence") {
    val got = Bpe.learnInMemory(corpusWf.toArray, 6)
    val (ref, _) = refBpe(corpusWf, 6)
    assert(got.map(m => (m.rank, m.left, m.right, m.freq)) == ref)
  }

  test("learnDistributed matches learnInMemory (adaptive paths agree)") {
    val viaDriver = Bpe.learn(wordsDf, 6)
    val viaCluster = Bpe.learn(wordsDf, 6, collectCap = 0L)
    assert(viaDriver == viaCluster)
    assert(viaDriver.size == 6)
  }

  test("learn routes: one-job collect equals toLocalIterator streaming") {
    // r15: vocabularies under graft.bpe.smallCollectBytes fetch in ONE
    // collect job; past it the per-partition toLocalIterator stream
    // takes over (bounded driver memory). Force the streaming route on
    // the same corpus and pin the learned merges equal — the fetch
    // route must never change results.
    val viaCollect = Bpe.learn(wordsDf, 6)
    val prev = System.getProperty("graft.bpe.smallCollectBytes")
    System.setProperty("graft.bpe.smallCollectBytes", "0")
    try {
      val viaStream = Bpe.learn(wordsDf, 6)
      assert(viaCollect == viaStream)
      assert(viaCollect.size == 6)
    } finally {
      if (prev == null) System.clearProperty("graft.bpe.smallCollectBytes")
      else System.setProperty("graft.bpe.smallCollectBytes", prev)
    }
  }

  test("learnWithStats count and docTokenIdsLong vocabRows routing") {
    import spark.implicits._
    val docs = Seq((1L, "abab abc b"), (2L, "xabx aaa b"))
      .toDF("doc_id", "text")
    val words = Bpe.wordFreq(docs, "text")
    val learned = Bpe.learnWithStats(words, 4)
    assert(learned.merges == Bpe.learn(words, 4))
    assert(learned.nWords == words.count())
    def rows(vr: Option[Long]) =
      Bpe.docTokenIdsLong(docs, "text", Seq("doc_id"), learned.merges,
          words, vocabRows = vr)
        .orderBy("doc_id", "word_pos", "tok_pos")
        .collect().map(_.toSeq).toSeq
    val default = rows(None)
    // the hint (broadcast route) and an over-cap count (plain-join
    // route) must both be value-identical to the probe-job default
    assert(rows(Some(learned.nWords)) == default)
    assert(rows(Some(Bpe.VocabBroadcastCap + 1)) == default)
    // the numMerges==0 sentinel (−1) is treated as UNKNOWN, not as
    // "fits": routeVocab falls back to the probe — results identical
    assert(rows(Some(-1L)) == default)
    assert(default.nonEmpty)
  }

  test("boundary safety: a merge never fires across symbol boundaries") {
    // force-learn (x,a) and (b,x) first, then apply (a,b): in "xabx"
    // the symbols are [xa, bx] — no (a,b) adjacency exists, though the
    // raw characters 'a','b' are adjacent in the word
    val merges = Seq(Bpe.Merge(1, "x", "a", 1L), Bpe.Merge(2, "b", "x", 1L),
      Bpe.Merge(3, "a", "b", 1L))
    val toks = wordsDf.filter(col("word") === "xabx")
      .select(Bpe.tokensCol(col("word"), merges).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("xa", "bx"))
    // whereas in "abab" the (a,b) merge fires on BOTH pairs
    val toks2 = wordsDf.filter(col("word") === "abab")
      .select(Bpe.tokensCol(col("word"), Seq(Bpe.Merge(1, "a", "b", 1L))).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks2 == Seq("ab", "ab"))
    // and overlapping candidates resolve leftmost-first: aaa → [aa, a]
    val toks3 = wordsDf.filter(col("word") === "aaa")
      .select(Bpe.tokensCol(col("word"), Seq(Bpe.Merge(1, "a", "a", 1L))).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks3 == Seq("aa", "a"))
  }

  test("column tokenization equals the reference under learned merges") {
    val merges = Bpe.learn(wordsDf, 6)
    val (_, refWords) = refBpe(corpusWf, 6)
    val got = wordsDf.select(col("word"),
        Bpe.tokensCol(col("word"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got == refWords)
    // and the broadcast-join vocab path agrees with the direct column
    val vocab = Bpe.tokenizeVocab(wordsDf, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    refWords.foreach { case (w, syms) => assert(vocab(w) == syms.size) }
  }

  test("learnIncremental equals the recount loop (engineered corpus)") {
    // the heap + occurrence-index trainer vs the naive full-recount
    // reference, merge-for-merge — including freq ties resolved by
    // (left, right) binary order
    val a = Bpe.learnIncremental(corpusWf.iterator, 12)
    val b = Bpe.learnRecount(corpusWf.toArray, 12)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("learnIncremental equals the recount loop (randomized corpora)") {
    // seeded random corpora over small alphabets maximize pair-count
    // collisions and merge-chain depth — the regimes where a stale
    // heap snapshot or a missed index update would diverge
    val rnd = new scala.util.Random(20260816L)
    (1 to 25).foreach { trial =>
      val alphabet = "abcd".take(2 + rnd.nextInt(3))
      val nWords = 1 + rnd.nextInt(40)
      val wf = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(8)
        val w = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        w -> (1L + rnd.nextInt(5))
      }.groupBy(_._1).map { case (w, fs) => w -> fs.map(_._2).sum }
      val n = 1 + rnd.nextInt(30)
      val inc = Bpe.learnIncremental(wf.iterator, n)
      val ref = Bpe.learnRecount(wf.toArray, n)
      assert(inc == ref, s"trial $trial diverged on $wf with $n merges")
    }
  }

  test("tie-breaks compare code points, not UTF-16 units (all three loops)") {
    // U+E000 (private use, one UTF-16 unit 0xE000) vs U+10000 (two
    // units, leading 0xD800): Java String.compareTo orders the
    // supplementary char FIRST (0xD800 < 0xE000), UTF-8 byte / code
    // point order the other way (E000 < 10000) — engineer an exact
    // count tie between (U+10000, x) and (U+E000, x) and require every
    // path to pick U+E000, the engine/DuckDB collation. This also
    // covers the symbol-split contract: Bpe.splitChars must keep the
    // supplementary char WHOLE (Java split("") would cut it into two
    // lone surrogates and learn a different alphabet than the engine)
    val hi = new String(Character.toChars(0x10000))
    val lo = ""
    assert(lo.compareTo(hi) > 0) // UTF-16 order would pick hi first
    assert(Bpe.utf8Compare(lo, hi) < 0) // code-point order picks lo
    val wf = Map(s"${hi}x" -> 5L, s"${lo}x" -> 5L)
    val inc = Bpe.learnIncremental(wf.iterator, 1)
    val rec = Bpe.learnRecount(wf.toArray, 1)
    assert(inc == rec)
    assert(inc.head.left == lo, s"expected U+E000 first, got ${inc.head}")
    import spark.implicits._
    val dist = Bpe.learn(wf.toSeq.toDF("word", "freq"), 1, collectCap = 0L)
    assert(dist == inc, "driver and distributed tie-breaks diverged")
  }

  test("learn minFreq: identical to learning on a pre-pruned table") {
    // the SentencePiece/HF min_frequency contract — pruning is part of
    // the INPUT definition, not an approximation knob
    val pruned = Bpe.learn(wordsDf, 6, minFreq = 30L)
    val manual = Bpe.learn(wordsDf.filter(col("freq") >= 30), 6)
    assert(pruned == manual)
    assert(pruned != Bpe.learn(wordsDf, 6),
      "the engineered corpus must actually change under the prune")
    // threshold 1 is the identity; the distributed route prunes too
    assert(Bpe.learn(wordsDf, 6, minFreq = 1L) == Bpe.learn(wordsDf, 6))
    assert(Bpe.learn(wordsDf, 6, collectCap = 0L, minFreq = 30L) == pruned)
  }

  test("fast tokenizer kernel equals the column form (learned merges)") {
    // BpeMergeTable.tokenize (candidate-prefilter merge loop) vs the
    // nested-replace column tower, token-for-token on the full vocab
    val merges = Bpe.learn(wordsDf, 6)
    val table = new BpeMergeTable(merges.toArray)
    val viaCol = wordsDf.select(col("word"),
        Bpe.tokensCol(col("word"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    corpusWf.keys.foreach { w =>
      assert(table.tokenize(w).toList == viaCol(w), s"word $w")
      assert(table.tokenCount(w) == viaCol(w).size)
    }
    // shared-concatenation candidates: (a,bc) and (ab,c) both key "abc"
    val amb = new BpeMergeTable(Array(
      Bpe.Merge(1, "b", "c", 9L), Bpe.Merge(2, "a", "bc", 8L),
      Bpe.Merge(3, "a", "b", 7L)))
    assert(amb.tokenize("abc").toList == List("abc"))
    assert(amb.tokenize("ab").toList == List("ab")) // rank-3 (a,b) fires
    assert(amb.tokenize("cab").toList == List("c", "ab"))
    // single char / untouched words pass through
    assert(amb.tokenize("z").toList == List("z"))
  }

  test("docTokenCountFastCol equals docTokenCountCol (kernel ≡ oracle form)") {
    import spark.implicits._
    val merges = Bpe.learn(wordsDf, 6)
    // adversarial whitespace (tabs, CR/LF, runs, leading/trailing),
    // SEP-containing words (skipped on both sides), multi-byte UTF-8,
    // empty and null docs
    val docs = Seq(
      (1L, "abab abc\taaa"), (2L, " \t xa bx\r\nxabx  "), (3L, "b"),
      (4L, "he" + Bpe.Sep + "x abc"), (5L, ""), (6L, "héllo wörld"),
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Bpe.docTokenCountFastCol(col("text"), merges).as("fast"),
        Bpe.docTokenCountCol(col("text"), merges).as("slow"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch: $r")
      else assert(r.getLong(1) == r.getLong(2), s"count mismatch: $r")
    }
  }

  test("vocabIds: base alphabet in binary order, merge ids by rank, min-id on collisions") {
    import spark.implicits._
    val words = Seq(("abc", 5L), ("bca", 3L)).toDF("word", "freq")
    // merges engineered so ranks 1 and 3 both produce the string "abc"
    val merges = Seq(Bpe.Merge(1, "ab", "c", 9L), Bpe.Merge(2, "a", "b", 8L),
      Bpe.Merge(3, "a", "bc", 7L))
    val ids = Bpe.vocabIds(words, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // base: a < b < c -> 0, 1, 2; merges: abc=3 (rank1, min over rank3's 5), ab=4
    assert(ids == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "abc" -> 3L, "ab" -> 4L))
  }

  test("docTokenIds: sequences in document order, ids from the shared vocab") {
    import spark.implicits._
    val docs = Seq((1L, "abab abc"), (2L, " b  cab ")).toDF("doc_id", "text")
    val words = Bpe.wordFreq(docs, "text")
    val merges = Bpe.learn(words, 2)
    val (_, refWords) = refBpe(
      Map("abab" -> 1L, "abc" -> 1L, "b" -> 1L, "cab" -> 1L), 2)
    val ids = Bpe.vocabIds(words, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.docTokenIds(docs, "text", Seq("doc_id"), merges, words)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toList))).toMap
    val exp = Map(
      1L -> (refWords("abab") ++ refWords("abc")),
      2L -> (refWords("b") ++ refWords("cab"))).map { case (k, toks) =>
      k -> ((toks.size.toLong, toks.map(ids).toList))
    }
    assert(got == exp)
  }

  test("docTokenIdsFast (map-only kernel) equals the join form, derived and pinned") {
    import spark.implicits._
    // adversarial whitespace, SEP word (skipped), multi-byte UTF-8,
    // empty and null docs (kernel emits empty sequences; join form has
    // no rows to group)
    val docs = Seq(
      (1L, "abab abc\taaa"), (2L, " \t xa bx\r\nxabx  "), (3L, "b cab"),
      (4L, "he" + Bpe.Sep + "x abc"), (5L, ""), (6L, "héllo wörld"),
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val words = Bpe.wordFreq(docs, "text")
    val merges = Bpe.learn(words, 6)
    val idRows = Bpe.vocabIds(words, merges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val fast = Bpe.docTokenIdsFast(docs, "text", Seq("doc_id"), merges, idRows)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toList))).toMap
    val join = Bpe.docTokenIds(docs, "text", Seq("doc_id"), merges, words)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toList))).toMap
    join.foreach { case (id, v) => assert(fast(id) == v, s"doc $id") }
    // every input doc present in the kernel output; token-less → empty
    assert(fast.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(fast(5L) == ((0L, Nil)) && fast(7L) == ((0L, Nil)))

    // pinned vocabulary MISSING some tokens: kernel and join form both
    // emit -1 (UNK) at those positions, ids agree everywhere else
    val pinnedRows = idRows.filter { case (t, _) => t != "a" && t != "ab" }
    val pinnedDf = pinnedRows.toDF("token", "token_id")
    val fastP = Bpe.docTokenIdsFast(docs, "text", Seq("doc_id"), merges, pinnedRows)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toList).toMap
    val joinP = Bpe.docTokenIds(docs, "text", Seq("doc_id"), merges, words,
        pinnedIds = Some(pinnedDf))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toList).toMap
    joinP.foreach { case (id, v) => assert(fastP(id) == v, s"pinned doc $id") }
    assert(fastP.values.exists(_.contains(-1L)),
      "fixture must exercise the UNK path")
  }

  test("packTokenIds: EOS-terminated concatenation cut into fixed shards per source") {
    import spark.implicits._
    val perDoc = Seq(
      ("s0", 1L, Seq(10L, 11L, 12L)), ("s0", 2L, Seq(13L)),
      ("s1", 3L, Seq(20L, 21L)))
      .toDF("source", "doc_id", "token_ids")
    val got = Bpe.packTokenIds(perDoc, "source", "doc_id",
        seqLen = 3, eosId = -2L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getSeq[Long](3).toList))).toMap
    // s0 stream: 10,11,12,EOS,13,EOS → [10,11,12] + [-2,13,-2]
    // s1 stream: 20,21,EOS → one short final shard
    assert(got == Map(
      ("s0", 0L) -> ((3L, List(10L, 11L, 12L))),
      ("s0", 1L) -> ((3L, List(-2L, 13L, -2L))),
      ("s1", 0L) -> ((3L, List(20L, 21L, -2L)))))
    // seqLen 1000: everything of a source lands in shard 0, in order
    val one = Bpe.packTokenIds(perDoc, "source", "doc_id", 1000, -2L)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](3).toList).toMap
    assert(one == Map(
      "s0" -> List(10L, 11L, 12L, -2L, 13L, -2L),
      "s1" -> List(20L, 21L, -2L)))
  }

  test("packTokenIds shuffleSeed: the exact md5 epoch permutation, ids conserved") {
    import spark.implicits._
    // one source, enough docs that a permutation is overwhelmingly
    // not the identity; each doc's ids encode its doc_id so the
    // packed stream reveals the order
    val perDoc = (1L to 8L).map(i => ("s0", i, Seq(i * 10, i * 10 + 1)))
      .toDF("source", "doc_id", "token_ids")
    def hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def packed(seed: String): List[Long] =
      Bpe.packTokenIds(perDoc, "source", "doc_id", 1000, -2L,
          shuffleSeed = Some(seed))
        .collect().map(r => r.getSeq[Long](3).toList).head
    def expected(seed: String): List[Long] =
      (1L to 8L).sortBy(i => (hex(s"$seed:$i"), i))
        .flatMap(i => List(i * 10, i * 10 + 1, -2L)).toList
    // the permutation is EXACTLY md5(seed:doc_id) order — the same
    // arithmetic the q_pack_shuffle oracle runs in DuckDB
    assert(packed("ep1") == expected("ep1"))
    assert(packed("ep2") == expected("ep2"))
    // different epochs, different layout; id multiset conserved
    assert(packed("ep1") != packed("ep2"))
    assert(packed("ep1").sorted == packed("ep2").sorted)
    assert(packed("ep1").sorted ==
      Bpe.packTokenIds(perDoc, "source", "doc_id", 1000, -2L)
        .collect().map(r => r.getSeq[Long](3).toList).head.sorted)
  }

  test("shared cache: byte budget admits, FIFO evicts tables (never clear-all)") {
    // distinct single-merge tables; value-keyed caches
    def mk(i: Int) = new BpeMergeTable(Array(Bpe.Merge(1, s"t$i", "q", 1L)))
    val tables = (0 until BpeMergeTable.MaxSharedTables + 1).map(mk)
    val first = BpeMergeTable.sharedCache(tables.head)
    first.maybePut("w", Integer.valueOf(1), 10L)
    assert(first.map.get("w") != null)
    val second = BpeMergeTable.sharedCache(tables(1))
    second.maybePut("w2", Integer.valueOf(2), 10L)
    tables.drop(2).foreach(BpeMergeTable.sharedCache(_))
    // registering table MaxSharedTables+1 evicted the OLDEST (first);
    // the second table's cache survived with its entry — not clear-all
    assert(BpeMergeTable.sharedCache(tables(1)) eq second)
    assert(second.map.get("w2") != null)
    val firstAgain = BpeMergeTable.sharedCache(tables.head)
    assert(!(firstAgain eq first) && firstAgain.map.get("w") == null,
      "oldest table should have been evicted")
  }

  test("IntHashSet: membership incl. zero/negative, no false negatives") {
    val rnd = new scala.util.Random(42)
    val keys = (Seq(0, -1, Int.MinValue, Int.MaxValue) ++
      Seq.fill(500)(rnd.nextInt())).distinct
    val s = new BpeMergeTable.IntHashSet(keys.size)
    keys.foreach(s.add)
    // the prefilter contract is NO FALSE NEGATIVES (false positives
    // just cost a map lookup) — every inserted key must be found
    keys.foreach(k => assert(s.contains(k), s"missing $k"))
    // and absent keys are genuinely rejected (not a degenerate
    // always-true set): none of these were inserted
    val present = keys.toSet
    val misses = (1 to 2000).map(_ => rnd.nextInt()).filterNot(present)
    assert(misses.count(!s.contains(_)) == misses.size)
  }

  test("wordFreq filters empties and separator-containing words") {
    import spark.implicits._
    val docs = Seq("  the the  cat ", "", "the dog", null)
      .toDF("text")
    val wf = Bpe.wordFreq(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wf == Map("the" -> 2L, "cat" -> 1L, "dog" -> 1L))
  }

  test("docTokenCountCol (pure column) equals the broadcast-join path") {
    import spark.implicits._
    val docs = Seq((1L, "abab abc aaa"), (2L, "  xa bx  xabx "), (3L, "b"))
      .toDF("doc_id", "text")
    val words = Bpe.wordFreq(docs, "text")
    val merges = Bpe.learn(words, 4)
    val direct = docs.select(col("doc_id"),
        Bpe.docTokenCountCol(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val joined = Bpe.docTokenCounts(docs, "text", Seq("doc_id"), merges, words)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(direct == joined)
    // empty text counts zero tokens (filter drops the "" pseudo-word)
    val z = Seq((9L, "")).toDF("doc_id", "text")
      .select(Bpe.docTokenCountCol(col("text"), merges)).collect().head.getLong(0)
    assert(z == 0L)
  }

  test("docTokenCounts: per-doc counts via the broadcast vocab") {
    import spark.implicits._
    val docs = Seq((1L, "abab abc"), (2L, "aaa b")).toDF("doc_id", "text")
    val words = Bpe.wordFreq(docs, "text")
    val merges = Bpe.learn(words, 2) // (a,b) then (ab,ab)… per corpus stats
    val got = Bpe.docTokenCounts(docs, "text", Seq("doc_id"), merges, words)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: tokenize each word under the same merges
    val (_, refWords) = refBpe(
      Map("abab" -> 1L, "abc" -> 1L, "aaa" -> 1L, "b" -> 1L), 2)
    val exp = Map(
      1L -> (2L, (refWords("abab").size + refWords("abc").size).toLong),
      2L -> (2L, (refWords("aaa").size + refWords("b").size).toLong))
    assert(got == exp)
  }
}
