package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueriesCommon
import graft.functions.{TextFunctions => TF}

/** The COMPOSED training-data curation pipeline: the individual
  * operators this engine already ships (quality filter, exact dedup,
  * MinHash-LSH near-dedup, leak-free decontamination split, per-source
  * token budget, sequence packing), chained as ONE dataflow — what a
  * real 100 TB curation run executes, as opposed to six standalone
  * jobs each re-scanning and re-tokenizing the corpus.
  *
  * Every stage reuses the exact rule its standalone oracle-gated query
  * proves (cited per stage below), so the composed result is itself
  * oracle-checkable as one DuckDB CTE chain (`q_curation_pipeline`).
  *
  * Composition is where the scale win lives:
  *   - the linear chain (quality → fp dedup → split → budget → pack)
  *     scans and tokenizes the corpus ONCE — six standalone jobs each
  *     pay their own scan + tokenize;
  *   - stages that need a per-key pass are windows over one exchange
  *     (fp for dedup, (band, v) for LSH, source for budget AND pack —
  *     the two windows share one source exchange), never an
  *     agg-plus-self-join that re-executes the upstream subtree;
  *   - the ONE structural second pass — LSH candidate derivation, a
  *     dedup being inherently self-referential — is a column-pruned
  *     (doc_id, text) branch with a fully map-side signature (see
  *     [[lshDropIds]]), not a materialization of the carried frame;
  *   - everything between exchanges is map-side: the quality verdict,
  *     the fp coin, the budget filter each run inside the stage that
  *     already owns the rows.
  *
  * Reference anchors: quality filter = C4 (Raffel et al. 2020 §2.2)
  * rules as in q_quality_filter; exact dedup keep-min fp as in
  * q_dedup_survivors/q_dedup_incremental (fp = md5 of the trim/lower
  * normalized text — ONE canonical fingerprint across the family);
  * near-dedup = MinHash-LSH banded buckets (Broder 1997; Lee et al.
  * ACL'22) with the engine-neutral md5 signature of q_minhash_oracle;
  * decontamination split = the content-keyed coin of q_split_leakfree;
  * token budget + packing = q_token_budget / q_pack.
  */
object Curation {

  /** One token count, shared by the quality bounds, the token budget,
    * and the packing bins — computed once per row and carried. The
    * allocation-free count form (r15): provably ≡ size(toksExpr), see
    * QueriesCommon.tokenCountFast's proof. */
  private def nTok: Column = QueriesCommon.tokenCountFast(col("text"))

  /** Stage 1 — quality filter (q_quality_filter's keep rule): token
    * count in [20, 80] and stopword ratio ≤ 0.2. Map-only: one scan,
    * verdict inline, no exchange. Carries (doc_id, source, text,
    * n_tok) forward so later stages never re-tokenize.
    *
    * `nTokCol` swaps the token COUNTER — and with it the denomination
    * of every downstream stage (quality bounds, budget, packing bins),
    * since all of them consume the carried n_tok. The default is the
    * whitespace count the oracle queries pin; the CLI's --bpe_merges/
    * --bpe_file passes a learned-BPE count (`Bpe.docTokenCountFastCol`
    * — one codegen'd kernel expression, exact vs the oracle-expressible
    * replace tower), which stays map-only so the stage's no-exchange
    * shape is unchanged. */
  def qualityFilter(docs: DataFrame, minTok: Int = 20, maxTok: Int = 80,
      maxStopRatio: Double = 0.2, carry: Seq[String] = Nil,
      nTokCol: Column = nTok): DataFrame = {
    val sr = TF.stopwordRatio(col("text"))
    docs
      .select(carry.map(col) ++ Seq(col("doc_id"), col("source"),
        col("text"), nTokCol.cast("long").as("n_tok"), sr.as("stop_ratio")): _*)
      .filter(col("n_tok") >= minTok && col("n_tok") <= maxTok
        && col("stop_ratio") <= maxStopRatio)
      .drop("stop_ratio")
  }

  /** Stage 2 — exact dedup, keep-min survivor per content fingerprint
    * (q_dedup_survivors semantics over the canonical fp of
    * q_dedup_incremental / q_split_leakfree). Window formulation: ONE
    * exchange on fp, no agg+self-join that would re-execute the
    * tokenize subtree. Carries fp forward — the decontamination split
    * keys its coin on it. */
  def exactDedup(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp")
    df.withColumn("fp", md5(trim(lower(col("text")))))
      .withColumn("__mn", min(col("doc_id")).over(w))
      .filter(col("__mn") === col("doc_id"))
      .drop("__mn")
  }

  /** Stage 3 — near-dedup via MinHash-LSH: 8 engine-neutral md5
    * minhashes over distinct 3-shingles (the q_minhash_oracle
    * signature), banded 4×2; a doc is dropped iff ANY of its band
    * buckets contains a lower doc_id (keep-min per bucket — the LSH
    * dedup rule of Lee et al. ACL'22 §4.1 as production pipelines run
    * it). The bucket pass is a window over one (band, v) exchange —
    * never an all-pairs join — and the shingle space is per-doc
    * bounded, so the shape survives 100 TB (the df-capped inverted
    * index of q_ngram_jaccard handles the verify-step variant; LSH
    * buckets alone are the cheaper standard). */
  def nearDedupLsh(df: DataFrame): DataFrame =
    df.join(lshDropIds(df), Seq("doc_id"), "left_anti")

  /** The ids the LSH rule drops. The whole signature is MAP-SIDE — the
    * per-doc minhash is an array fold over the doc's own shingles, not
    * an explode + re-aggregate (which would shuffle every shingle row
    * on doc_id before the band pass) — so the only exchange candidate
    * derivation pays is the narrow (band, v) window over
    * (doc_id, band, v) triples. The anti-join back to the carried
    * frame is the one structural cost of ANY dedup stage: the drop
    * set derives from the same corpus it filters, so the candidate
    * branch re-scans (doc_id, text) — column-pruned recompute, the
    * right trade at scale against materializing the full upstream
    * frame. No explicit distinct on the drop ids: a left-anti only
    * consults existence, and each id repeats at most 4× (once per
    * band) — a distinct would add a doc_id exchange to shrink a
    * build side the join dedups anyway. */
  private[graft] def lshDropIds(df: DataFrame): DataFrame = {
    val toks = QueriesCommon.toksExpr
    // distinct 3-shingles (q_minhash_oracle construction: docs under 3
    // tokens collapse to one whole-doc shingle; empty docs to [""])
    val shs = when(size(col("__toks")) < 3,
        array(array_join(col("__toks"), " ")))
      .otherwise(expr(
        "array_distinct(transform(sequence(1, size(__toks) - 2), " +
          "i -> array_join(slice(__toks, i, 3), ' ')))"))
    val mhCols = (0 until 8).map(i => expr(
      s"array_min(transform(__shs, x -> md5(concat('$i:', x))))").as(s"mh$i"))
    val bands = df.select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), shs.as("__shs"))
      .select(col("doc_id") +: mhCols: _*)
      .select(col("doc_id"), posexplode(array(
        concat(col("mh0"), col("mh1")), concat(col("mh2"), col("mh3")),
        concat(col("mh4"), col("mh5")), concat(col("mh6"), col("mh7"))))
        .as(Seq("band", "v")))
    bands
      .withColumn("__mn", min(col("doc_id")).over(
        Window.partitionBy("band", "v")))
      .filter(col("__mn") < col("doc_id"))
      .select("doc_id")
  }

  /** Stage 4 — decontamination split: the content-keyed md5 coin of
    * q_split_leakfree (bucket of fp, train < 230) — duplicates of an
    * eval document can never reach the training set by construction.
    * The pipeline keeps TRAIN; map-side, zero exchanges. */
  def keepTrainSplit(df: DataFrame): DataFrame = keepSplit(df, "train")

  /** The q_split_leakfree coin generalized to any split: train < 230 ≤
    * val < 243 ≤ test (the 90/5/5-ish cut the standalone query pins). */
  def keepSplit(df: DataFrame, split: String): DataFrame = {
    val b = graft.ops.Mixture.bucket("fp")
    split match {
      case "train" => df.filter(b < 230)
      case "val" => df.filter(b >= 230 && b < 243)
      case "test" => df.filter(b >= 243)
      case "all" => df
      case other => sys.error(s"unknown split '$other'")
    }
  }

  /** Stage 5 — per-source token budget (q_token_budget's rule: budget
    * derived from the source name, greedy prefix in seeded md5 order).
    * Delegates to the proven Mixture.tokenBudget kernel — one window
    * over the source exchange (the salted variant swaps in for skewed
    * sources at extreme scale; same oracle). */
  def tokenBudget(df: DataFrame): DataFrame =
    tokenBudgetWith(df,
      expr("(cast(substr(source, 4) AS int) % 3 + 1) * 1000"))

  /** The budget stage with an explicit per-row budget column — the CLI
    * passes a constant; the oracle query derives it from the source
    * name (q_token_budget's rule). */
  def tokenBudgetWith(df: DataFrame, budget: org.apache.spark.sql.Column)
      : DataFrame =
    graft.ops.Mixture.tokenBudget(
      df.withColumn("budget", budget),
      "source", "doc_id", col("n_tok"), col("budget"))

  /** Stage 6 — sequence packing (q_pack's rule at the shared n_tok):
    * per source in doc_id order, bin = exclusive-cumsum div `budget`
    * tokens; reports per-bin occupancy. Reuses the source exchange the
    * budget window just established. */
  def pack(df: DataFrame, binTokens: Int = 512): DataFrame =
    packAssign(df, binTokens)
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"))

  /** Per-document bin assignment (what a trainer actually reads); the
    * reporting `pack` aggregates this. */
  def packAssign(df: DataFrame, binTokens: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum_start",
        sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", expr(s"__cum_start div $binTokens"))
      .drop("__cum_start")
  }

  /** The named stages, in order — the bench tool materializes each
    * prefix to report per-stage rows/wall next to the one-dataflow
    * composed run. */
  val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
    "quality_filter" -> (qualityFilter(_)),
    "exact_dedup" -> (exactDedup(_)),
    "neardup_lsh" -> (nearDedupLsh(_)),
    "decontam_split" -> (keepTrainSplit(_)),
    "token_budget" -> (tokenBudget(_)),
    "pack" -> (pack(_, 512)))

  /** Materialization barrier between the exact-dedup output and its
    * TWO consumers — the carried frame and the self-referential LSH
    * candidate branch (`nearDedupLsh` anti-joins the frame against
    * ids derived FROM the frame). Without it Spark executes the
    * scan → tokenize → dedup subtree once PER consumer: a second full
    * corpus pass, measured at 10.5M docs as the composed form losing
    * to the materialized N-job chain (26.9 s vs 17.6 s —
    * docs/artifacts/curation_r13_bigdata15.txt) once the staged
    * baseline was costed honestly. The barrier stores O(survivors)
    * (MEMORY_AND_DISK: spills, never recomputes; BlockManager's
    * per-partition block locking means concurrent consumers share ONE
    * computation rather than racing), while the recompute costs
    * O(corpus) — and dedup exists precisely because survivors ≪
    * corpus, so the barrier side wins wherever the pipeline matters.
    * This is the composed-dataflow analogue of the stage boundary a
    * staged pipeline pays as a parquet write+read.
    *
    * Lifecycle: the persisted relation stays registered in the
    * session's CacheManager for the frame's lifetime (a query builder
    * cannot know when its caller's action is done). Drivers that run
    * many queries on one session should `spark.catalog.clearCache()`
    * between timed/independent runs — graft.Bench and QueryOnce do,
    * both for hygiene and because the CacheManager would otherwise
    * serve this materialization to the next logically-equal plan and
    * un-time the corpus pass. The CLI unpersists after its write. */
  private def dedupBarrier(docs: DataFrame,
      nTokCol: Column = nTok): DataFrame =
    exactDedup(qualityFilter(docs, nTokCol = nTokCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // r15 A/B note: an eager localCheckpoint barrier (plan-truncating,
      // guide §3.3) was measured AGAINST this persist at sf0.1 and lost
      // 1.2 → 1.9 s per curation query (the eager checkpoint pays a
      // full extra materialization job + RDD serialization up front,
      // where persist fills lazily inside the one pass that already
      // runs) — the persist barrier stands.

  /** The full composed pipeline: documents in, packed-bin occupancy
    * out, one dataflow (with the one deliberate materialization
    * barrier — see [[dedupBarrier]]). `nTokCol` re-denominates every
    * stage (see [[qualityFilter]]). */
  def pipeline(docs: DataFrame, nTokCol: Column = nTok): DataFrame =
    stages.drop(2).foldLeft(dedupBarrier(docs, nTokCol)) {
      case (df, (_, f)) => f(df) }
      .orderBy("source", "bin")

  /** The curated DOCUMENT set (the pipeline's stage-5 output — what a
    * training run would actually read): doc_id, source, n_tok, in
    * deterministic order. The CLI export subcommand writes this. */
  def curatedDocs(docs: DataFrame, nTokCol: Column = nTok): DataFrame =
    stages.slice(2, 5).foldLeft(dedupBarrier(docs, nTokCol)) {
      case (df, (_, f)) => f(df) }
      .select(col("doc_id"), col("source"), col("n_tok").cast("long").as("n_tok"))

  /** The STREAMING front-end of the pipeline: the stream-safe prefix
    * (quality filter → exact dedup → leak-free decontamination split)
    * composed as ONE incremental dataflow over a documents stream —
    * the continuous form of a crawl-ingest curation front-end, where
    * each arriving document is admitted or dropped online instead of
    * waiting for the nightly batch.
    *
    * Stage mapping (each reuses the exact batch rule):
    *   - quality filter: map-only, identical verdict column-for-column
    *     (`qualityFilter` with the event-time column carried through);
    *   - exact dedup: the same canonical fp (md5 of trim/lower text);
    *     state is one fp-keyed store bounded by the watermark horizon
    *     ([[graft.streaming.StreamingOps.streamingDedupExact]]), and
    *     with `fpIndex` (the materialized fingerprint set of a prior
    *     batch run) the stream also anti-joins the existing corpus —
    *     `q_dedup_incremental`'s nightly-crawl shape, continuous;
    *   - decontamination split: the fp-keyed coin is pure map-side, so
    *     a duplicate of an eval document STILL can't reach train even
    *     if it slipped the dedup horizon.
    *
    * Semantics vs batch: the batch prefix keeps the MIN doc_id per fp;
    * the stream keeps the FIRST arrival — identical when the stream
    * replays in doc_id order, and the honest contract otherwise (an
    * online system can't know a smaller id arrives later). The
    * LSH near-dedup, token budget, and packing stages are inherently
    * batch finishers — keep-min over unbounded band buckets and the
    * global greedy budget order need the full curated set — so they
    * run as the periodic sweep over this front-end's accumulated
    * output (the same batch/streaming split `streamingDedupExact`
    * documents; streaming near-dup semantics are covered separately by
    * `streamingNearDupSimhash`). */
  def streamingPrefix(docs: DataFrame, tsCol: String,
      watermarkDelay: String, fpIndex: Option[DataFrame] = None,
      split: String = "train", minTok: Int = 20, maxTok: Int = 80,
      maxStopRatio: Double = 0.2, nTokCol: Column = nTok): DataFrame = {
    // nTokCol re-denominates the stream exactly as it does the batch
    // pipeline — stream/batch equivalence then requires BOTH to use
    // the same counter (the CLI only admits a PERSISTED merge table
    // here, --bpe_file: learning needs a static corpus, and a
    // stream-learned table could never match the batch finishers')
    val fped = qualityFilter(docs, minTok, maxTok, maxStopRatio,
        carry = Seq(tsCol), nTokCol = nTokCol)
      .withColumn("fp", md5(trim(lower(col("text")))))
    val deduped = fpIndex match {
      case Some(ix) => graft.streaming.StreamingOps
        .incrementalDedupStream(fped, tsCol, "fp", ix, watermarkDelay)
      case None => graft.streaming.StreamingOps
        .streamingDedupExact(fped, tsCol, "fp", watermarkDelay)
    }
    // text rides along: the batch finishers this front-end feeds
    // (LSH near-dedup tokenizes text; a full batch `curate` over the
    // accumulated output) need it — an output without text would make
    // the documented periodic sweep impossible
    keepSplit(deduped, split)
      .select(col(tsCol), col("doc_id"), col("source"), col("text"),
        col("n_tok"), col("fp"))
  }
}
