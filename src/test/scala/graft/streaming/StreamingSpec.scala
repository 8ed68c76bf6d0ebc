package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("windowedCounts: tumbling window with watermark drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedCounts(df, "ts", "event_type",
      "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode("update").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      input.addData((t(1, 5), "click", 1.0), (t(1, 30), "click", 2.0),
        (t(2, 10), "view", 5.0))
      q.processAllAvailable()
      // late row: 01:xx after watermark advanced to 02:00 → dropped
      input.addData((t(0, 30), "click", 99.0))
      q.processAllAvailable()
      val out = spark.table("win").collect()
      val click1 = out.filter(r => r.getAs[String]("event_type") == "click")
      assert(click1.map(_.getAs[Long]("n")).sum == 2L)
      assert(!out.exists(_.getAs[Double]("sum_value") == 99.0))
    } finally q.stop()
  }

  test("streamingDedupExact admits a fingerprint once within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "fp")
    val dedup = StreamingOps.streamingDedupExact(df, "ts", "fp", "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      input.addData((t(1, 0), 1L, "A"), (t(1, 1), 2L, "A"), (t(1, 2), 3L, "B"))
      q.processAllAvailable()
      // same fingerprint again within the horizon → dropped
      input.addData((t(1, 3), 4L, "A"))
      q.processAllAvailable()
      val ids = spark.table("sdedup").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids.contains(1L) && ids.contains(3L))
      assert(!ids.contains(2L) && !ids.contains(4L))
    } finally q.stop()
  }

  test("streamingNearDupSimhash admits one of a near-dup pair, distinct docs pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.NearDoc]
    val out = StreamingOps.streamingNearDupSimhash(
      input.toDS(), maxHamming = 3, bucketBits = 8,
      watermarkDelay = "10 minutes", ttlMs = 600000L)
    val q = out.writeStream.format("memory").queryName("sneardup")
      .outputMode("append").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      val base = 0x7A5A5A5A5A5A5A5AL
      // doc 2 differs from doc 1 by 2 low bits (same bucket, hamming 2);
      // doc 3 is a different bucket entirely
      input.addData(
        StreamingOps.NearDoc(1L, t(1, 0), base),
        StreamingOps.NearDoc(3L, t(1, 0), ~base))
      q.processAllAvailable()
      input.addData(StreamingOps.NearDoc(2L, t(1, 1), base ^ 3L))
      q.processAllAvailable()
      // a genuinely distant doc in the SAME bucket is admitted
      input.addData(StreamingOps.NearDoc(4L, t(1, 2), base ^ 0x00000000000FF0FFL))
      q.processAllAvailable()
      val ids = spark.table("sneardup").collect()
        .map(_.getAs[Long]("id")).toSet
      assert(ids == Set(1L, 3L, 4L), s"got $ids")
    } finally q.stop()
  }

  test("streamingNearDupSimhash admission is deterministic within a trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.NearDoc]
    val out = StreamingOps.streamingNearDupSimhash(
      input.toDS(), maxHamming = 3, bucketBits = 8,
      watermarkDelay = "10 minutes", ttlMs = 600000L)
    val q = out.writeStream.format("memory").queryName("sneardup2")
      .outputMode("append").start()
    try {
      def t(h: Int, m: Int, s: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:$s%02d")
      val base = 0x7A5A5A5A5A5A5A5AL
      // both near-dups arrive in ONE batch: the earlier ts (tie-broken
      // by id) must win, the other must be dropped
      input.addData(
        StreamingOps.NearDoc(9L, t(1, 0, 1), base ^ 1L),
        StreamingOps.NearDoc(5L, t(1, 0, 0), base))
      q.processAllAvailable()
      val ids = spark.table("sneardup2").collect()
        .map(_.getAs[Long]("id")).toSet
      assert(ids == Set(5L), s"got $ids")
    } finally q.stop()
  }

  test("lastWinsUpserts keeps newest version per id across batches (J6 streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Upsert]
    val out = StreamingOps.lastWinsUpserts(input.toDS())
    val q = out.writeStream.format("memory").queryName("upserts")
      .outputMode("update").start()
    try {
      input.addData(StreamingOps.Upsert("a", 1L, "v1"),
        StreamingOps.Upsert("b", 1L, "w1"))
      q.processAllAvailable()
      // older update for a must be suppressed; newer must win
      input.addData(StreamingOps.Upsert("a", 0L, "stale"),
        StreamingOps.Upsert("b", 5L, "w2"))
      q.processAllAvailable()
      val rows = spark.table("upserts").as[StreamingOps.Upsert].collect()
      assert(!rows.exists(_.payload == "stale"))
      assert(rows.filter(_.id == "b").map(_.payload).contains("w2"))
    } finally q.stop()
  }

  test("sessionizeStream closes a session on gap and emits it (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Click]
    val out = StreamingOps.sessionizeStream(input.toDS(),
      gapMs = 60_000L, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      def c(u: String, s: String) =
        StreamingOps.Click(u, java.sql.Timestamp.valueOf(s))
      // session 1: two events 30 s apart; then a 10-min gap starts session 2
      input.addData(c("u1", "2026-01-01 10:00:00"), c("u1", "2026-01-01 10:00:30"))
      q.processAllAvailable()
      input.addData(c("u1", "2026-01-01 10:10:00"), c("u2", "2026-01-01 10:10:00"))
      q.processAllAvailable()
      // advance the watermark far enough to time out all open sessions
      input.addData(c("u3", "2026-01-01 11:00:00"))
      q.processAllAvailable()
      input.addData(c("u3", "2026-01-01 12:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sess").as[StreamingOps.SessionOut].collect()
      val u1 = rows.filter(_.user == "u1").sortBy(_.start_ms)
      assert(u1.length == 2)
      assert(u1.head.n_events == 2L &&
        u1.head.end_ms - u1.head.start_ms == 30_000L)
      assert(u1.last.n_events == 1L)
      assert(rows.filter(_.user == "u2").map(_.n_events).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("sessionizeStream merges watermark-admitted late events into the open session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Click]
    val out = StreamingOps.sessionizeStream(input.toDS(),
      gapMs = 120_000L, watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("latesess")
      .outputMode("append").start()
    try {
      def c(s: String) = StreamingOps.Click("u1", java.sql.Timestamp.valueOf(s))
      input.addData(c("2026-01-01 10:00:00"), c("2026-01-01 10:01:00"))
      q.processAllAvailable()
      // late but within the 10-minute watermark: one inside the open
      // session, one extending it backwards within the gap
      input.addData(c("2026-01-01 10:00:30"), c("2026-01-01 09:59:30"))
      q.processAllAvailable()
      // far-future event closes the session
      input.addData(c("2026-01-01 10:10:00"))
      q.processAllAvailable()
      val rows = spark.table("latesess").as[StreamingOps.SessionOut].collect()
        .filter(_.n_events > 1)
      assert(rows.length == 1, rows.mkString(", "))
      assert(rows.head.n_events == 4L)
      assert(rows.head.start_ms ==
        java.sql.Timestamp.valueOf("2026-01-01 09:59:30").getTime)
      assert(rows.head.end_ms ==
        java.sql.Timestamp.valueOf("2026-01-01 10:01:00").getTime)
    } finally q.stop()
  }

  test("sessionizeStream state survives a checkpointed restart") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft-sess-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-sess-out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(name: String, rows: (String, java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("user", "ts").coalesce(1)
        .write.mode("append").parquet(inDir)
    def startQuery() = {
      val in = spark.readStream
        .schema("user STRING, ts TIMESTAMP").parquet(inDir)
        .as[StreamingOps.Click]
      StreamingOps.sessionizeStream(in, gapMs = 60_000L,
          watermarkDelay = "0 seconds")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    // batch 1: an open 2-event session for u1, then stop (state checkpointed)
    writeBatch("b1", ("u1", ts("2026-01-01 10:00:00")), ("u1", ts("2026-01-01 10:00:30")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // batch 2 lands while the query is DOWN; the restarted query must
    // recover u1's open session from the checkpoint to close it
    writeBatch("b2", ("u1", ts("2026-01-01 10:10:00")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val sessions = spark.read.parquet(outDir)
      .as[StreamingOps.SessionOut].collect()
    val closed = sessions.filter(s => s.user == "u1" && s.n_events == 2L)
    assert(closed.length == 1, sessions.mkString(", "))
    assert(closed.head.end_ms - closed.head.start_ms == 30_000L)
  }

  test("file-source stream: parquet dir → watermarked window → sink (end to end)") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("stream-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream-ckpt").toString
    def batch(tag: String, hours: Seq[Int]): Unit =
      hours.map(h => (java.sql.Timestamp.valueOf(f"2026-02-01 $h%02d:15:00"), tag, 1.0))
        .toDF("ts", "event_type", "value")
        .write.mode("append").parquet(srcDir)
    batch("click", Seq(1, 1, 2))
    val stream = spark.readStream
      .schema("ts timestamp, event_type string, value double")
      .parquet(srcDir)
    val agg = StreamingOps.windowedCounts(stream, "ts", "event_type",
      "1 hour", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("filewin")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // second file lands later — incremental discovery picks it up
      batch("click", Seq(2))
      q.processAllAvailable()
      val out = spark.table("filewin")
        .groupBy("window_start").agg(max("n").as("n")).collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(out("2026-02-01 01:00:00.0") == 2L)
      assert(out("2026-02-01 02:00:00.0") == 2L)
    } finally q.stop()
  }

  test("unexported: checkpoint-state resume replaces the metadata marker (S6f)") {
    import spark.implicits._
    val all = (1 to 10).map(_.toString).toDF("id")
    val done = Seq("1", "2", "3").toDF("id")
    val rest = StreamingOps.unexported(all, done, "id").collect().map(_.getString(0))
    assert(rest.sorted.toSeq == (4 to 10).map(_.toString).sorted)
  }

  test("funnelStream: late middle-stage event refines the chain across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.FunnelEvent]
    // 1-hour lateness horizon: the out-of-order click below arrives
    // within it (events under the watermark are dropped — see the
    // EventTimeTimeout premise test)
    val out = StreamingOps.funnelStream(input.toDS(),
      Seq("view", "click", "purchase"), "1 hour")
    val q = out.writeStream.format("memory").queryName("funnel_s")
      .outputMode("update").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      def ev(u: String, ts: java.sql.Timestamp, s: String) =
        StreamingOps.FunnelEvent(u, ts, s)
      // trigger 1: view + purchase only — chain stops at stage 1
      // (purchase can't qualify without a click before it)
      input.addData(ev("u1", t(1, 0), "view"), ev("u1", t(1, 30), "purchase"),
        ev("u2", t(1, 5), "view"))
      q.processAllAvailable()
      val r1 = spark.table("funnel_s").filter(col("user") === "u1")
        .orderBy(col("stages_reached").desc).head()
      assert(r1.getAs[Int]("stages_reached") == 1, s"got $r1")
      // trigger 2: the click arrives late (between view and purchase) —
      // the retained purchase candidate now qualifies: full chain
      input.addData(ev("u1", t(1, 15), "click"))
      q.processAllAvailable()
      val rows = spark.table("funnel_s").filter(col("user") === "u1").collect()
      val best = rows.map(_.getAs[Int]("stages_reached")).max
      assert(best == 3, s"late click did not complete funnel: ${rows.mkString(";")}")
      val chain = rows.filter(_.getAs[Int]("stages_reached") == 3).head
        .getAs[scala.collection.Seq[Long]]("stage_ms")
      assert(chain(0) < chain(1) && chain(1) < chain(2), s"chain not ordered: $chain")
      // u2 never clicked: still stage 1
      val u2 = spark.table("funnel_s").filter(col("user") === "u2")
        .collect().map(_.getAs[Int]("stages_reached")).max
      assert(u2 == 1)
    } finally q.stop()
  }

  test("funnelStream candidate state survives a checkpointed restart") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft-fun-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fun-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-fun-out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: (String, java.sql.Timestamp, String)*): Unit =
      rows.toSeq.toDF("user", "ts", "stage").coalesce(1)
        .write.mode("append").parquet(inDir)
    def startQuery() = {
      val in = spark.readStream
        .schema("user STRING, ts TIMESTAMP, stage STRING").parquet(inDir)
        .as[StreamingOps.FunnelEvent]
      // Update-mode flatMapGroupsWithState can't feed the append-only
      // file sink directly; foreachBatch bridges it
      StreamingOps.funnelStream(in, Seq("view", "click", "purchase"), "1 hour")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingOps.FunnelOut], _: Long) =>
          df.write.mode("append").parquet(outDir); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
    }
    // batch 1: view + a RETAINED purchase candidate (no click yet)
    writeBatch(("u1", ts("2026-01-01 10:00:00"), "view"),
      ("u1", ts("2026-01-01 10:30:00"), "purchase"))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // batch 2 lands while the query is DOWN; the restart must recover
    // the purchase candidate from the checkpoint for the late click to
    // complete the chain
    writeBatch(("u1", ts("2026-01-01 10:15:00"), "click"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val best = spark.read.parquet(outDir)
      .filter(col("user") === "u1")
      .agg(max("stages_reached")).head().getInt(0)
    assert(best == 3, "restart lost the retained purchase candidate")
  }

  test("funnelStream drops events below the watermark (EventTimeTimeout premise)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.FunnelEvent]
    val q = StreamingOps.funnelStream(input.toDS(),
      Seq("view", "click", "purchase"), "10 minutes")
      .writeStream.format("memory").queryName("funnel_wm")
      .outputMode("update").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      def ev(u: String, ts: java.sql.Timestamp, s: String) =
        StreamingOps.FunnelEvent(u, ts, s)
      // u3 reaches stage 2; a 9:00 event pushes the watermark to 8:50
      input.addData(ev("u3", t(1, 0), "view"), ev("u3", t(2, 0), "click"),
        ev("u9", t(9, 0), "view"))
      q.processAllAvailable()
      // this purchase (3:00) is far below the 8:50 watermark: the
      // pruning contract requires Spark to DROP it, so u3 must stay at
      // stage 2 — if late rows leaked through (NoTimeout behavior),
      // u3 would reach 3 and pruned state could give wrong chains
      input.addData(ev("u3", t(3, 0), "purchase"))
      q.processAllAvailable()
      val u3 = spark.table("funnel_wm").filter(col("user") === "u3")
        .collect().map(_.getAs[Int]("stages_reached")).max
      assert(u3 == 2, s"sub-watermark event was not dropped (got stage $u3)")
    } finally q.stop()
  }

  test("funnelStream: floor pruning never drops live candidates (mid-funnel entry)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.FunnelEvent]
    val q = StreamingOps.funnelStream(input.toDS(),
      Seq("view", "click", "purchase"), "10 minutes")
      .writeStream.format("memory").queryName("funnel_bot")
      .outputMode("update").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      def ev(u: String, ts: java.sql.Timestamp, s: String) =
        StreamingOps.FunnelEvent(u, ts, s)
      // bot enters mid-funnel: clicks/purchases with NO view; wm → 4:50
      input.addData(ev("b1", t(1, 0), "click"), ev("b1", t(1, 30), "purchase"),
        ev("b1", t(5, 0), "click"))
      q.processAllAvailable()
      // a view arrives (≥ wm); chain must complete with the RETAINED
      // post-wm click and a fresh purchase — pruning may only have
      // dropped candidates that were provably dead
      input.addData(ev("b1", t(4, 55), "view"), ev("b1", t(5, 10), "purchase"))
      q.processAllAvailable()
      val best = spark.table("funnel_bot").filter(col("user") === "b1")
        .collect().map(_.getAs[Int]("stages_reached")).max
      assert(best == 3, s"live candidate was wrongly pruned (got $best)")
    } finally q.stop()
  }

  test("funnelStream evicts idle keys past evictAfterMs; fresh events restart the funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.FunnelEvent]
    val q = StreamingOps.funnelStream(input.toDS(),
      Seq("view", "click", "purchase"), "10 minutes",
      evictAfterMs = Some(60 * 60 * 1000L))
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode("update").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      def ev(u: String, ts: java.sql.Timestamp, s: String) =
        StreamingOps.FunnelEvent(u, ts, s)
      input.addData(ev("u1", t(1, 0), "view"), ev("u1", t(1, 5), "click"))
      q.processAllAvailable() // u1 at stage 2; wm ≈ 0:55
      // push the watermark far past wm + evictAfter (0:55 + 1h)
      input.addData(ev("zz", t(9, 0), "view"))
      q.processAllAvailable()
      input.addData(ev("zz", t(12, 0), "view"))
      q.processAllAvailable() // u1's timeout fires; state removed
      // u1 returns: the funnel restarts from scratch — a purchase with
      // no remembered view/click reaches stage 0
      input.addData(ev("u1", t(12, 5), "purchase"))
      q.processAllAvailable()
      val stages = spark.table("funnel_evict").filter(col("user") === "u1")
        .collect().map(_.getAs[Int]("stages_reached")).toSet
      assert(stages.contains(2), "pre-eviction progress missing")
      // with state evicted, the lone purchase restarts at stage 0;
      // had the view/click survived, it would have completed stage 3
      assert(stages.contains(0) && !stages.contains(3),
        s"state survived eviction: $stages")
    } finally q.stop()
  }

  test("funnelStream reproduces batch q_funnel stage counts (single batch)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val evs = raw
      .select(col("user_id").cast("string").as("user"),
        // micros via the schema-sniffing accessor: exact integer math
        // under both testdata ts encodings, so strict-inequality
        // chains agree with the batch query unless two events share a
        // microsecond (none do in this corpus)
        timestamp_micros(graft.QueriesCommon.eventTsMicros(raw)).as("ts"),
        col("event_type").as("stage"))
      .as[StreamingOps.FunnelEvent]
      .collect().toSeq
    val input = MemoryStream[StreamingOps.FunnelEvent]
    val q = StreamingOps.funnelStream(input.toDS(),
      Seq("view", "click", "purchase"), "1 minute")
      .writeStream.format("memory").queryName("funnel_eq")
      .outputMode("update").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      // latest emission per user (one trigger → one row per active user)
      val perUser = spark.table("funnel_eq")
        .groupBy("user").agg(max("stages_reached").as("r"))
      val got = (
        perUser.filter(col("r") >= 1).count(),
        perUser.filter(col("r") >= 2).count(),
        perUser.filter(col("r") >= 3).count())
      val batch = graft.SparkEntry.queries("q_funnel")(spark, dir).head()
      val want = (batch.getAs[Long]("n_view"),
        batch.getAs[Long]("n_view_click"),
        batch.getAs[Long]("n_view_click_purchase"))
      assert(got == want, s"stream $got != batch $want")
    } finally q.stop()
  }

  test("lmAdmissionStream == batch scoring on a replayed corpus (r4 ask #7)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
        col("text"))
    // model trained on a trusted reference slice; the stream is the corpus
    val lm = StreamingOps.trainBigramLm(docs.filter(col("doc_id") < 300))
    lm.c12.cache(); lm.c1.cache(); lm.vocab.cache()
    // threshold at the batch median nll → both admit classes non-empty
    val batchScored = StreamingOps.lmAdmissionStream(docs, lm, 0.0, "1 minute")
      .drop("admitted")
    val thr = batchScored.stat.approxQuantile("nll", Array(0.5), 0.0).head
    val want = StreamingOps.lmAdmissionStream(docs, lm, thr, "1 minute")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(want.exists(_._4) && want.exists(!_._4)) // both classes present
    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSeq
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingOps.lmAdmissionStream(
      input.toDF().toDF("doc_id", "ts", "text"), lm, thr, "1 minute")
      .writeStream.format("memory").queryName("lmadm")
      .outputMode("append").start()
    try {
      // replay in three chunks, then a single-token flush doc whose ts
      // pushes the watermark past every real doc (it carries no bigrams,
      // so it never scores — in stream OR batch)
      val chunks = rows.grouped((rows.size + 2) / 3).toSeq
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      input.addData((-1L,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700100000L)),
        "flush"))
      q.processAllAvailable()
      val got = spark.table("lmadm").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
        .sortBy(_._1)
      assert(got.length == want.length, s"${got.length} != ${want.length}")
      got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
    } finally q.stop()
  }

  test("lmAdmissionStream drops documents older than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq("the quick brown fox", "the quick red fox")
      .toDF("text")
    val lm = StreamingOps.trainBigramLm(ref)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingOps.lmAdmissionStream(
      input.toDF().toDF("doc_id", "ts", "text"), lm, 100.0, "10 minutes")
      .writeStream.format("memory").queryName("lmadm_late")
      .outputMode("append").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      input.addData((1L, t(1, 0), "the quick brown fox"))
      input.addData((2L, t(3, 0), "the quick red fox"))
      q.processAllAvailable()
      // watermark is now 02:50; a 01:05 doc is finalized-past → dropped
      input.addData((3L, t(1, 5), "the quick brown fox"))
      input.addData((4L, t(5, 0), "flush"))
      q.processAllAvailable()
      val ids = spark.table("lmadm_late").collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L) && ids.contains(2L) && !ids.contains(3L))
      // doc 1 scored entirely in-model → admitted under a loose threshold
      assert(spark.table("lmadm_late").filter(col("doc_id") === 1L)
        .head.getAs[Boolean]("admitted"))
    } finally q.stop()
  }

  test("incrementalDedupStream admits exactly the batch q_dedup_incremental kept set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val bucket =
      "(instr('0123456789abcdef', substr(md5(cast(doc_id AS string)), 31, 1)) - 1) * 16" +
        " + instr('0123456789abcdef', substr(md5(cast(doc_id AS string)), 32, 1)) - 1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("fp", md5(trim(lower(col("text")))))
      .withColumn("is_new", expr(s"($bucket) >= 128"))
    val index = docs.filter(!col("is_new")).select("fp").distinct()
    // replay the new half as a firehose in doc_id order with synthetic
    // in-horizon event times
    val fresh = docs.filter(col("is_new"))
      .select(col("doc_id"), col("fp")).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          1700000000L + r.getLong(0))), r.getString(1)))
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val admitted = StreamingOps.incrementalDedupStream(
      input.toDF().toDF("doc_id", "ts", "fp"), "ts", "fp", index, "1 hour")
    val q = admitted.writeStream.format("memory").queryName("incdedup")
      .outputMode("append").start()
    try {
      input.addData(fresh.toSeq)
      q.processAllAvailable()
      val gotFps = spark.table("incdedup").collect()
        .map(_.getAs[String]("fp")).toSet
      val wantFps = docs.filter(col("is_new"))
        .join(index, Seq("fp"), "left_anti")
        .select("fp").distinct().collect().map(_.getString(0)).toSet
      assert(gotFps == wantFps,
        s"admitted ${gotFps.size} fps, batch keeps ${wantFps.size}")
      // the total admitted count equals q_dedup_incremental's kept sum
      val batchKept = graft.SparkEntry.queries("q_dedup_incremental")(spark, dir)
        .agg(sum("n_kept")).head.getLong(0)
      assert(spark.table("incdedup").count() == batchKept)
    } finally q.stop()
  }
}
