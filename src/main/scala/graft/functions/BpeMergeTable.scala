package graft.functions

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** An immutable BPE merge table with a FAST EXACT tokenizer — the
  * production encode kernel behind [[Bpe.tokenizeVocab]] and the
  * [[graft.expressions.BpeDocTokenCount]] expression.
  *
  * Semantics: identical to the canonical sequential form (apply every
  * merge in rank order, each as one leftmost-first non-overlapping
  * pass — [[Bpe.applyMergesCol]]'s replace tower and the trainer's
  * symbol-array loop). The speedup is the CANDIDATE PRE-FILTER: at the
  * moment merge (l, r) is applied, every live token is a contiguous
  * substring of the original word (tokens start as single characters
  * and merging concatenates ADJACENT tokens, preserving contiguity by
  * induction), so (l, r) can only ever fire if the concatenation l+r
  * occurs as a contiguous substring of the word. Tokenize therefore
  * probes each substring of length 2..maxTokenLen against a
  * concat-keyed index, collects the (few) candidate merges, and
  * applies ONLY those, in rank order — O(len·maxTokenLen) hash probes
  * plus O(candidates·len) applications per word, independent of the
  * table size, where the replace tower pays O(numMerges·len) per word
  * and falls out of codegen past a few hundred merges (the engine's
  * NearestList lesson, r13). Applying a subset that provably contains
  * every merge that can fire yields the exact sequential result, so
  * the kernel is bit-equal to the column form — BpeSpec pins it, and
  * q_bpe_vocab's DuckDB replace-tower oracle re-proves it end-to-end
  * on every Verify run.
  *
  * Constant sizing (the NearestList/MatVecProject discipline): the
  * table travels to executors as a broadcast variable or plan
  * reference of ~(total merge string bytes) — a 50k-merge production
  * table is ~2 MB, driver- and task-sized by design. The word→count
  * cache is PROCESS-WIDE, keyed by the table's CONTENT fingerprint
  * (deserialization makes a fresh instance per task on the
  * plan-reference path — an instance-owned cache would restart cold
  * every task and never amortize), bounded by [[CacheCap]] entries per
  * table and [[MaxSharedTables]] live tables, and thread-safe.
  *
  * Equality/hashCode are VALUE-based (the merge array), so two
  * expressions built from the same merge table compare equal —
  * subexpression elimination and canonicalized-plan hashing behave,
  * and plan hashes are run-deterministic.
  */
final class BpeMergeTable(val merges: Array[Bpe.Merge]) extends Serializable {
  import BpeMergeTable._

  override def equals(other: Any): Boolean = other match {
    case t: BpeMergeTable =>
      (t eq this) || java.util.Arrays.equals(
        merges.asInstanceOf[Array[AnyRef]], t.merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]])
  override def toString: String = s"BpeMergeTable(${merges.length} merges)"

  /** concat(left+right) → merges with that concatenation, rank ASC.
    * Multiple merges can share one concatenation ((a,bc) vs (ab,c)). */
  @transient private lazy val byConcat: java.util.HashMap[String, Array[Bpe.Merge]] = {
    val m = new java.util.HashMap[String, Array[Bpe.Merge]]()
    merges.sortBy(_.rank).foreach { mg =>
      val k = mg.left + mg.right
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(mg) else prev :+ mg)
    }
    m
  }

  /** Longest merged-token length — bounds the substring probe window. */
  @transient private lazy val maxTokenLen: Int =
    if (merges.isEmpty) 2
    else math.max(2, merges.map(m => m.left.length + m.right.length).max)

  @transient private lazy val cache = sharedCache(this)

  /** BPE tokens of `word` — exact sequential semantics (see class doc). */
  def tokenize(word: String): Array[String] = {
    if (word.length <= 1) return Array(word)
    // candidate merges: rank → merge, deduped, rank-ascending
    var cands: java.util.TreeMap[Integer, Bpe.Merge] = null
    val n = word.length
    var i = 0
    while (i < n - 1) {
      val maxJ = math.min(n, i + maxTokenLen)
      var j = i + 2
      while (j <= maxJ) {
        val ms = byConcat.get(word.substring(i, j))
        if (ms != null) {
          if (cands == null) cands = new java.util.TreeMap[Integer, Bpe.Merge]()
          var k = 0
          while (k < ms.length) { cands.put(ms(k).rank, ms(k)); k += 1 }
        }
        j += 1
      }
      i += 1
    }
    var syms = Bpe.splitChars(word)
    if (cands != null) {
      val it = cands.values().iterator()
      while (it.hasNext && syms.length > 1) {
        val m = it.next()
        if (containsPair(syms, m.left, m.right))
          syms = applyMergeOnce(syms, m.left, m.right, m.left + m.right)
      }
    }
    syms
  }

  /** Token count of one word, memoized per table instance. */
  def tokenCount(word: String): Int = {
    val hit = cache.get(word)
    if (hit != null) return hit.intValue()
    val c = tokenize(word).length
    if (cache.size() < CacheCap) cache.put(word, Integer.valueOf(c))
    c
  }

  /** [[Bpe.docTokenCountCol]]'s contract over a whole document as one
    * byte-scan: whitespace-run word split (Java-regex `\s` is exactly
    * the ASCII bytes 0x09–0x0D and 0x20, and every byte of a multi-byte
    * UTF-8 sequence is ≥ 0x80, so the byte scan can never split inside
    * a code point and matches `split(trim(text), '\s+')` + drop-empties
    * exactly — the TokenHashUtil equivalence argument, spec-pinned
    * there on adversarial inputs), SEP-containing words skipped (U+0001
    * is the single byte 0x01), token counts summed. Called from
    * generated code (BpeDocTokenCount's doGenCode). */
  def docTokenCount(text: UTF8String): Long = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes
    var total = 0L
    var i = 0
    while (i < n) {
      while (i < n && isSep(Platform.getByte(base, off + i))) i += 1
      if (i < n) {
        val start = i
        var hasSepChar = false
        while (i < n && !isSep(Platform.getByte(base, off + i))) {
          if (Platform.getByte(base, off + i) == 0x01) hasSepChar = true
          i += 1
        }
        if (!hasSepChar) {
          val w = UTF8String.fromAddress(base, off + start, i - start).toString
          total += tokenCount(w)
        }
      }
    }
    total
  }
}

object BpeMergeTable {
  /** Word→count cache bound: 4M entries ≈ a full production vocab;
    * past it the kernel degrades to compute-per-word, never OOM. */
  final val CacheCap = 1 << 22

  /** Live shared-cache bound: distinct merge TABLES in flight in one
    * executor process — more than a handful means a misuse (a table
    * per micro-batch, say); evict everything and start over rather
    * than leak. */
  final val MaxSharedTables = 8

  private val shared =
    new java.util.concurrent.ConcurrentHashMap[BpeMergeTable,
      java.util.concurrent.ConcurrentHashMap[String, Integer]]()

  /** The process-wide word→count cache for a table, keyed by the
    * table's VALUE (BpeMergeTable equality compares the merge arrays,
    * so a hash collision between two different tables still resolves
    * to two distinct caches — never shared counts). */
  private def sharedCache(t: BpeMergeTable)
      : java.util.concurrent.ConcurrentHashMap[String, Integer] = {
    val hit = shared.get(t)
    if (hit != null) return hit
    if (shared.size() >= MaxSharedTables) shared.clear()
    val fresh = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val prev = shared.putIfAbsent(t, fresh)
    if (prev != null) prev else fresh
  }

  /** Java-regex `\s` bytes (see TokenHashUtil). */
  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private[functions] def containsPair(
      syms: Array[String], l: String, r: String): Boolean = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) return true
      i += 1
    }
    false
  }

  /** One leftmost-first non-overlapping pass of merge (l, r) → lr —
    * the single-merge kernel shared by the trainer and the tokenizer. */
  private[functions] def applyMergeOnce(
      syms: Array[String], l: String, r: String, lr: String): Array[String] = {
    val out = new Array[String](syms.length)
    var oi = 0
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out(oi) = lr; oi += 1; i += 2
      } else { out(oi) = syms(i); oi += 1; i += 1 }
    }
    if (oi == syms.length) out else java.util.Arrays.copyOf(out, oi)
  }

  /** [[applyMergeOnce]] that also reports the OLD-array indices of the
    * first and last merge site through `sites` (a reusable 2-slot
    * out-param — the trainer calls this per touched word and a tuple
    * per call would be allocation noise). sites(0) = sites(1) = −1
    * when nothing fired (callers guard with containsPair). */
  private[functions] def applyMergeSites(
      syms: Array[String], l: String, r: String, lr: String,
      sites: Array[Int]): Array[String] = {
    sites(0) = -1; sites(1) = -1
    val out = new Array[String](syms.length)
    var oi = 0
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        if (sites(0) < 0) sites(0) = i
        sites(1) = i
        out(oi) = lr; oi += 1; i += 2
      } else { out(oi) = syms(i); oi += 1; i += 1 }
    }
    if (oi == syms.length) out else java.util.Arrays.copyOf(out, oi)
  }
}
