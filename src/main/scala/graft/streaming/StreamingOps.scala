package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extensions (SURVEY §2.11 / §7.4).
  *
  * The reference is batch-only; its one incremental mechanism — the
  * Pinecone `modify_to_search` marker that mutates live metadata to
  * track export progress (`export_vdf/pinecone_export.py:184-259`,
  * `432-465`) — becomes checkpointed streaming state here: watermarked
  * tumbling-window aggregation for continuous rollups, and
  * `flatMapGroupsWithState` for exactly-once last-wins upsert dedupe.
  * Source data is never mutated.
  */
object StreamingOps {

  /** Tumbling-window event rollup: the streaming twin of the batch
    * qWindowHourly query. Late data beyond the watermark is dropped
    * deterministically instead of corrupting closed windows. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Streaming exact dedup for a document firehose: drop any row whose
    * content fingerprint was already seen within the watermark horizon.
    * `dropDuplicatesWithinWatermark` bounds the fingerprint state by
    * event time (unbounded-state dedup dies on an infinite stream), so
    * the contract is "no duplicate admitted within `watermarkDelay` of
    * the original" — the batch `Dedup.exactGroups` pass remains the
    * periodic full-history sweep. One state-store lookup per row, keyed
    * and partitioned by the fingerprint. */
  def streamingDedupExact(docs: DataFrame, tsCol: String, fpCol: String,
      watermarkDelay: String): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(fpCol)

  /** Streaming incremental dedup against a static fingerprint index —
    * the continuous form of `q_dedup_incremental`'s nightly-crawl
    * shape: a crawler firehose admits a doc only if its content
    * fingerprint is (a) absent from the existing corpus index and
    * (b) unseen in the stream within the watermark horizon. The index
    * side is ONLY fingerprints (the materialized `q_dedup_exact`
    * output a pipeline keeps between runs) joined stream-static
    * left-anti — broadcast when it fits, shuffled-on-fp when it
    * doesn't; within-stream state is one fp-keyed store bounded by
    * event time. The batch pass stays the periodic full-history
    * sweep, exactly as for `streamingDedupExact`. */
  def incrementalDedupStream(docs: DataFrame, tsCol: String, fpCol: String,
      index: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .join(index.select(col(fpCol)).distinct(), Seq(fpCol), "left_anti")
      .dropDuplicatesWithinWatermark(fpCol)

  final case class Upsert(id: String, ts: Long, payload: String)

  /** Streaming last-wins dedupe (J6 as continuous state): keeps the
    * latest (by ts) version of each id, emitting a row only when the
    * stored version changes. State is Spark-checkpointed — the
    * principled replacement for the reference's marker-mutation
    * progress tracking. */
  def lastWinsUpserts(updates: Dataset[Upsert]): Dataset[Upsert] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.id)
      .flatMapGroupsWithState[Upsert, Upsert](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Upsert], state: GroupState[Upsert]) =>
          val newest = (rows ++ state.getOption.iterator)
            .reduceOption((a, b) => if (a.ts >= b.ts) a else b)
          newest match {
            case Some(v) if !state.getOption.contains(v) =>
              state.update(v); Iterator.single(v)
            case _ => Iterator.empty
          }
      }
  }

  /** Incremental export progress as streaming state: which ids have
    * been exported (replaces S6f's metadata-marker hack). Batch-side
    * resume = anti-join against this checkpointed set. */
  def unexported(all: DataFrame, exportedIds: DataFrame, idCol: String): DataFrame =
    all.join(exportedIds, Seq(idCol), "left_anti")

  final case class NearDoc(id: Long, ts: java.sql.Timestamp, simhash: Long)
  final case class BucketState(entries: List[(Long, Long)]) // (simhash, tsMs)

  /** Streaming NEAR-duplicate admission filter — the continuous twin of
    * the batch `Dedup.simhashPairs` path. A document is admitted only
    * if no already-admitted document in its simhash bucket (the high
    * `bucketBits` bits — same blocking as the batch operator, same
    * approximation: near-dups differing in those bits are missed) lies
    * within `maxHamming` bits. Per-bucket state holds the admitted
    * (simhash, tsMs) fingerprints; entries older than the event-time
    * watermark are pruned every trigger, and an idle bucket's whole
    * state is dropped by event-time timeout `ttlMs` past its newest
    * admission — state is bounded by live buckets × horizon admissions,
    * never corpus size. Contract mirrors streamingDedupExact: "no
    * near-dup admitted within the watermark horizon of the original";
    * the batch pipeline remains the periodic full-history sweep. */
  def streamingNearDupSimhash(docs: Dataset[NearDoc], maxHamming: Int,
      bucketBits: Int, watermarkDelay: String, ttlMs: Long): Dataset[NearDoc] = {
    require(bucketBits > 0 && bucketBits < 64, "bucketBits in (0, 64)")
    require(ttlMs > 0, "ttlMs must be positive (keeps the timeout " +
      "timestamp ahead of the watermark for surviving entries)")
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(d => d.simhash >>> (64 - bucketBits))
      .flatMapGroupsWithState[BucketState, NearDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[NearDoc], state: GroupState[BucketState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            state.remove(); Iterator.empty
          } else {
            val horizon =
              if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs()
              else Long.MinValue
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_._2 >= horizon)
            val admitted = List.newBuilder[NearDoc]
            // deterministic admission order within a trigger
            rows.toArray.sortBy(d => (d.ts.getTime, d.id)).foreach { d =>
              val near = entries.exists { case (sh, _) =>
                java.lang.Long.bitCount(sh ^ d.simhash) <= maxHamming
              }
              if (!near) {
                admitted += d
                entries ::= (d.simhash, d.ts.getTime)
              }
            }
            if (entries.nonEmpty) {
              state.update(BucketState(entries))
              state.setTimeoutTimestamp(entries.map(_._2).max + ttlMs)
            } else state.remove()
            admitted.result().iterator
          }
      }
  }

  /** A trained bigram LM as broadcastable count tables — the
    * q_lm_score model (add-1 smoothed bigram cross-entropy,
    * `QueriesExt6.qLmScore`) factored so batch and streaming score
    * through the SAME tables. At 100 TB the reference-corpus counts are
    * exactly what the batch note promises: small enough to broadcast
    * (vocabulary-bounded), trained once, reused across every
    * micro-batch. */
  final case class BigramLm(c12: DataFrame, c1: DataFrame, vocab: DataFrame)

  /** Train the count tables from a trusted reference corpus (a static
    * frame with a `text` column): per-bigram counts, per-history
    * counts, and the distinct-token vocabulary size for the +V
    * smoothing denominator. Bigrams come from the SAME codegen'd
    * kernel as the oracle-gated batch scorer
    * (`QueriesCommon.bigramHashesCol` — identical tokenization by
    * construction, and TokenHashSpec pins the kernel against the SQL
    * formulation). */
  def trainBigramLm(refDocs: DataFrame): BigramLm = {
    val bg = refDocs
      .select(explode(graft.QueriesCommon.bigramHashesCol("text")).as("p"))
      .select(col("p.w1"), col("p.w2"))
    BigramLm(
      c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")),
      c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1")),
      vocab = refDocs
        .select(explode(graft.QueriesCommon.tokenHashesCol("text")).as("tok"))
        .agg(countDistinct("tok").cast("double").as("v")))
  }

  /** Streaming LM-score admission filter (VERDICT r4 ask #7): score
    * each arriving document's add-1-smoothed bigram cross-entropy
    * against a model trained on a static reference corpus, and admit
    * it iff `nll <= threshold` — the CCNet-style quality gate run AT
    * INGEST instead of as a batch sweep.
    *
    * Plan shape per micro-batch: map-side bigram tail-zip on the
    * stream, two stream-static broadcast joins against the count
    * tables (no stream-side shuffle for the lookups), then ONE
    * watermarked aggregation keyed (doc_id, ts) — the event-time key
    * makes append mode finalize each doc exactly once when the
    * watermark passes its timestamp, and bounds the aggregation state
    * by the same horizon. Docs with < 2 tokens carry no bigrams and
    * are not scored (the batch scorer drops them identically).
    *
    * `docs` needs (doc_id, ts, text). Output: doc_id, ts, n_bigrams,
    * nll (rounded like the oracle-gated batch query), admitted. */
  def lmAdmissionStream(docs: DataFrame, lm: BigramLm, threshold: Double,
      watermarkDelay: String): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        explode(graft.QueriesCommon.bigramHashesCol("text")).as("p"))
      .select(col("doc_id"), col("ts"),
        col("p.w1"), col("p.w2"))
      .join(broadcast(lm.c12), Seq("w1", "w2"), "left_outer")
      .join(broadcast(lm.c1), Seq("w1"), "left_outer")
      .crossJoin(broadcast(lm.vocab))
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-log((coalesce(col("c12"), lit(0L)) + 1.0) /
          (coalesce(col("c1"), lit(0L)) + col("v")))).as("nll"))
      .select(col("doc_id"), col("ts"), col("n_bigrams"),
        round(col("nll"), 6).as("nll"),
        (round(col("nll"), 6) <= threshold).as("admitted"))

  final case class Click(user: String, ts: java.sql.Timestamp)
  final case class SessionAgg(user: String, events: Long, startMs: Long,
    endMs: Long)
  final case class SessionOut(user: String, n_events: Long, start_ms: Long,
    end_ms: Long)

  /** Streaming sessionization — the continuous twin of
    * `ops.Sessions.sessionize`. Per-user state holds the open session
    * as (count, start, end); an event within `gapMs` of the session's
    * bounds MERGES into it (min/max-adjusting the bounds, so late
    * events the watermark still admits extend the session instead of
    * corrupting it); an event more than `gapMs` after the end closes
    * it and opens a new one; a disjoint event more than `gapMs`
    * BEFORE the start (a fully-late earlier session) is emitted as
    * its own closed session. Sessions idle for `gapMs` past the
    * watermark close via event-time timeout, so state size is bounded
    * by the number of *live* keys, not corpus size. */
  def sessionizeStream(clicks: Dataset[Click], gapMs: Long,
      watermarkDelay: String): Dataset[SessionOut] = {
    import clicks.sparkSession.implicits._
    clicks
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: String, rows: Iterator[Click], state: GroupState[SessionAgg]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // no activity for gapMs past the watermark: close the session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(s.user, s.events, s.startMs, s.endMs))
          } else {
            val sorted = rows.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t >= s.startMs - gapMs && t <= s.endMs + gapMs =>
                  cur = Some(s.copy(events = s.events + 1,
                    startMs = math.min(s.startMs, t),
                    endMs = math.max(s.endMs, t)))
                case Some(s) if t > s.endMs + gapMs =>
                  closed ::= SessionOut(s.user, s.events, s.startMs, s.endMs)
                  cur = Some(SessionAgg(user, 1L, t, t))
                case Some(_) =>
                  // disjoint session entirely before the open one —
                  // late beyond merging; emit as its own session
                  closed ::= SessionOut(user, 1L, t, t)
                case None =>
                  cur = Some(SessionAgg(user, 1L, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  final case class FunnelEvent(user: String, ts: java.sql.Timestamp,
      stage: String)
  final case class FunnelTimes(times: Seq[Seq[Long]])
  final case class FunnelOut(user: String, stages_reached: Int,
      stage_ms: Seq[Long])

  /** Streaming ordered funnel (the continuous form of q_funnel): per
    * user, the earliest chain t₁ < t₂ < … across the named stages,
    * refined as events arrive IN ANY ORDER across triggers within the
    * watermark horizon (a late 'view' may lower t₁ and admit
    * previously-rejected 'click's).
    *
    * Correct-under-late-data needs candidate retention: per stage the
    * state keeps the event times that could still participate. Pruning
    * rests on the premise that rows older than the watermark never
    * reach the function — Spark enforces that for
    * flatMapGroupsWithState ONLY under EventTimeTimeout (with
    * NoTimeout, late rows are delivered), hence the timeout mode here
    * even though no per-key timeout is registered. Given that premise:
    *  - a chain prefix is FINAL once every link is strictly below the
    *    watermark (nothing can arrive to lower an earlier link), and
    *    collapses to its single chosen time;
    *  - each stage keeps a FLOOR — a provable lower bound on its
    *    eventual chain time given current candidates and the fact that
    *    future events arrive ≥ wm — and stage-j candidates at or below
    *    stage j−1's floor can never follow any achievable predecessor:
    *    drop. (This subsumes both "predecessor finalized" and "stalled
    *    prefix, e.g. mid-funnel bots with no first stage", including
    *    stages two or more past an empty one.)
    * State per key is therefore bounded by the watermark horizon. The
    * KEY COUNT still grows with distinct users — lifetime funnels
    * retain one small entry per user, like any per-user aggregate;
    * pass `evictAfterMs` to forget keys idle past that horizon (their
    * funnel restarts from scratch if they reappear). Emits one
    * Update-mode row per active user per trigger. */
  def funnelStream(events: Dataset[FunnelEvent], stages: Seq[String],
      watermarkDelay: String, evictAfterMs: Option[Long] = None): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val k = stages.size
    val idx = stages.zipWithIndex.toMap
    events
      .withWatermark("ts", watermarkDelay)
      .filter(col("stage").isin(stages: _*))
      .groupByKey(_.user)
      .flatMapGroupsWithState[FunnelTimes, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (user: String, rows: Iterator[FunnelEvent], state: GroupState[FunnelTimes]) =>
          if (state.hasTimedOut) {
            // idle past the eviction horizon: forget the key
            state.remove()
            Iterator.empty
          } else {
          val prev = state.getOption.map(_.times.map(_.toList))
            .getOrElse(Seq.fill(k)(List.empty[Long]))
          val fresh = rows.toSeq.groupBy(e => idx(e.stage))
          var times: Seq[List[Long]] = prev.zipWithIndex.map { case (l, i) =>
            (l ++ fresh.getOrElse(i, Nil).map(_.ts.getTime)).sorted.distinct
          }
          // earliest chain over the retained candidates
          val chosen = Array.fill(k)(-1L)
          var lo = Long.MinValue
          var i = 0
          var ok = true
          while (i < k && ok) {
            times(i).find(_ > lo) match {
              case Some(t) => chosen(i) = t; lo = t
              case None => ok = false
            }
            i += 1
          }
          val wm = state.getCurrentWatermarkMs()
          val finalized = Array.fill(k)(false)
          var pfx = true
          for (j <- 0 until k) {
            // strict < wm: immune to either boundary convention for
            // Spark's late-row filter
            pfx = pfx && chosen(j) >= 0 && chosen(j) < wm
            finalized(j) = pfx
          }
          // floors(j): no achievable chain can have t_j below this.
          // candMin = best current candidate continuing the floor chain;
          // futureMin = best a not-yet-arrived event could do (≥ wm and
          // after the predecessor floor). Monotone by construction.
          val floors = new Array[Long](k)
          var prevFloor = Long.MinValue
          for (j <- 0 until k) {
            val futureMin = math.max(wm, prevFloor)
            val f = times(j).find(_ > prevFloor) match {
              case Some(c) => math.min(c, futureMin)
              case None => futureMin
            }
            floors(j) = f
            prevFloor = f
          }
          times = times.zipWithIndex.map { case (l, j) =>
            if (finalized(j)) List(chosen(j)) // single survivor
            else if (j > 0) l.filter(_ > floors(j - 1)) // provably-dead candidates
            else l
          }
          state.update(FunnelTimes(times))
          evictAfterMs.foreach { ms =>
            // anchor idleness to the key's own latest event (the
            // watermark is 0 on the first trigger); timeouts fire on
            // the first trigger after the watermark passes this
            val base = fresh.valuesIterator.flatten
              .map(_.ts.getTime).foldLeft(wm)(math.max)
            if (base > 0) state.setTimeoutTimestamp(base + ms)
          }
          Iterator.single(FunnelOut(user, chosen.count(_ >= 0),
            chosen.toSeq))
          }
      }
  }

  /** Streaming IVF index maintenance — the incremental half of
    * `Ivf.writeIndex` (the reference's import loop upserts vectors
    * into live indexes batch by batch, `pinecone_import.py:219-281`;
    * here the "index" is the at-rest list-partitioned layout). New
    * vectors stream in, each is assigned to its coarse list with the
    * IDENTICAL codegen'd argmax-dot expression the batch build uses
    * (per-row, stateless — no watermark, no shuffle, no state store),
    * and the append-mode file sink adds list-partitioned parquet under
    * the SAME layout `writeIndex` produces: existing files are never
    * rewritten, a reader's partition-pruned search sees new vectors at
    * the next micro-batch boundary, and the checkpoint makes ingest
    * exactly-once across restarts. Centroids stay fixed between
    * retrains — the FAISS operational model (retrain offline when
    * drift warrants; reassignment stays incremental). */
  def ivfIngest(vecs: DataFrame, centroids: Seq[(Int, Array[Float])],
      idCol: String, vecCol: String, indexPath: String,
      checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.similarity.Ivf.assignTo(vecs, centroids, idCol, vecCol)
      .writeStream
      .partitionBy("list_id")
      .format("parquet")
      .option("path", indexPath)
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Append())
      .start()
}
