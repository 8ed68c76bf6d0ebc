package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume probe for the STREAMING curation front-end (the r13 verdict
  * ask #5): drives the real `curate --follow` CLI verb — i.e.
  * `Curation.streamingPrefix` behind a checkpointed AvailableNow
  * parquet source/sink — over ≥1M documents arriving as ≥10 fresh-file
  * increments, each drained by its OWN CLI invocation (the production
  * usage: a cron-invoked drain against an append-only crawl
  * directory, checkpoint carrying source offsets across invocations).
  *
  * Claims under test:
  *   1. flat state: the fp dedup store is bounded by the watermark
  *      HORIZON's live fingerprints, not total documents seen —
  *      event time advances ~2 ms/doc so a 10-minute watermark spans
  *      ~3 increments; state must plateau there while total docs
  *      grow 4× past it (the r8 StreamingStateProbe contract, now
  *      through the composed curation prefix: quality verdict +
  *      dedup + split in one incremental dataflow);
  *   2. flat per-drain wall: each drain pays for ITS increment, not
  *      for history;
  *   3. the `--fp_index` handoff: a second run over a fresh directory
  *      + fresh checkpoint, indexed by run 1's accumulated OUTPUT,
  *      rejects run-1 duplicates on first arrival — the
  *      `q_dedup_incremental` nightly-crawl shape chained across two
  *      streaming runs.
  *
  * Duplicate structure: ~1/7 of docs reuse the text of a doc 35 ids
  * earlier (same or previous increment — inside the watermark horizon,
  * so the state store must catch them); run 2's extra duplicates copy
  * run-1 texts verbatim (caught only via the fp index).
  *
  * Usage: tools/run_main.sh graft.tools.CurationStreamProbe
  *        [docs] [increments] (defaults 1,200,000 × 12: 8 drains in
  *        run 1, 4 indexed drains in run 2).
  */
object CurationStreamProbe {
  def main(args: Array[String]): Unit = {
    val totalDocs = args.headOption.map(_.toLong).getOrElse(1200000L)
    val nInc = args.lift(1).map(_.toInt).getOrElse(12)
    val run1Inc = nInc * 2 / 3
    val perInc = totalDocs / nInc
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("curstream").toString
    val (in1, out1, ck1) = (s"$root/in1", s"$root/out1", s"$root/ck1")
    val (in2, out2, ck2) = (s"$root/in2", s"$root/out2", s"$root/ck2")

    // state-store rows observed by the CLI-started query, captured via
    // a session-level listener (the CLI doesn't expose its query)
    val lastState = new java.util.concurrent.atomic.AtomicLong(-1L)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          lastState.set(e.progress.stateOperators.map(_.numRowsTotal).sum)
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    // ~31-70 syllable words per doc (quality filter keeps 20..80, zero
    // stopwords). Words are xxhash64-mixed per (seed, j) — a LINEAR
    // index mod 64 would make the text a function of seed mod 320 and
    // collapse the corpus to ~320 distinct documents. 1/7 of docs
    // (id ≡ 3 mod 7) duplicate the text of doc id−36; 36 ≢ 0 (mod 7),
    // so the duplicated doc emitted its OWN text — a real dup pair,
    // 72 ms of event time apart (inside the watermark horizon).
    val syls = (for (a <- "ktmnsrlp"; b <- "aeiouywz") yield s"$a$b")
      .map(s => s"'$s'").mkString("array(", ",", ")")
    def textSql(seed: String): String =
      s"""array_join(transform(
           sequence(1, 31 + cast(pmod($seed, 40) AS int)),
           j -> element_at($syls,
                  cast(pmod(xxhash64($seed, j), 64) AS int) + 1)),
         ' ')"""
    def writeInc(dir: String, inc: Int, idBase: Long): Unit =
      spark.range(idBase + inc * perInc, idBase + (inc + 1) * perInc)
        .select(col("id").as("doc_id"),
          expr("concat('src', cast(pmod(id, 5) AS int))").as("source"),
          expr(textSql("CASE WHEN pmod(id, 7) = 3 THEN id - 36 ELSE id END"))
            .as("text"),
          expr("timestamp_micros(1700000000000000 + id * 2000)").as("ts"))
        .coalesce(4)
        .write.mode("append").parquet(dir)

    def drain(in: String, out: String, ck: String, extra: Seq[String])
        : (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val rc = graft.cli.Cli.run(spark, Seq("curate", "--follow",
        "--in", in, "--out", out, "--checkpoint", ck,
        "--ts_column", "ts", "--watermark", "10 minutes",
        "--id_column", "doc_id", "--split", "all") ++ extra)
      require(rc == 0, s"curate --follow exited $rc")
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, lastState.get(), spark.read.parquet(out).count())
    }

    println(s"# streaming curation probe: $totalDocs docs, $nInc fresh-file " +
      s"increments of $perInc; watermark 10 min ~ 3 increments of horizon")
    println(s"# run 1: $run1Inc drains, one CLI invocation each " +
      "(checkpoint carries offsets across invocations)")
    var prevRows = 0L
    val states = Array.ofDim[Long](run1Inc)
    for (k <- 0 until run1Inc) {
      writeInc(in1, k, 0L)
      val (wall, st, rows) = drain(in1, out1, ck1, Nil)
      states(k) = st
      println(f"drain=$k%2d docsSeen=${(k + 1) * perInc}%9d wall=$wall%6.1f s " +
        f"stateRows=$st%9d admitted=${rows - prevRows}%8d totalOut=$rows%9d")
      prevRows = rows
    }
    // flat-state assert: once the horizon fills, consecutive drains
    // must hold the store FLAT (within 2%) while docsSeen keeps
    // growing — the difference between "runs forever" and "OOMs on
    // day two" (watermark expiry lags one batch, so the plateau level
    // itself is ~2 horizons of live fps; what matters is the slope)
    require(states(run1Inc - 1) <= (states(run1Inc - 3) * 51) / 50,
      s"state still growing at the tail: ${states.mkString(", ")}")
    println(s"state plateau holds: ${states(run1Inc - 3)} -> " +
      s"${states(run1Inc - 1)} over ${2 * perInc} further docs " +
      s"(full series: ${states.mkString(", ")})")

    println(s"# run 2: fresh dir + checkpoint, --fp_index <run1 output>; " +
      "increments duplicate run-1 texts 1-in-3")
    // 1/3 of run-2 docs copy a run-1 text: the seed maps to a multiple
    // of 7 inside run 1's id space — id ≡ 0 (mod 7) docs emitted their
    // OWN text in run 1 (the dup rule fires on ≡ 3), so the copied fp
    // is guaranteed present in run 1's output. Non-dup seeds are
    // offset past every run-1 id so their content is fresh.
    val r1Space = run1Inc * perInc
    def writeInc2(inc: Int): Unit =
      spark.range(inc * perInc, (inc + 1) * perInc)
        .select((col("id") + totalDocs * 10).as("doc_id"),
          expr("concat('src', cast(pmod(id, 5) AS int))").as("source"),
          expr(textSql(s"CASE WHEN pmod(id, 3) = 0" +
            s" THEN pmod(id, ${r1Space / 7}) * 7" +
            s" ELSE id + ${totalDocs * 10} END")).as("text"),
          expr(s"timestamp_micros(1800000000000000 + id * 2000)").as("ts"))
        .coalesce(4)
        .write.mode("append").parquet(in2)
    prevRows = 0L
    for (k <- run1Inc until nInc) {
      writeInc2(k - run1Inc)
      val (wall, st, rows) = drain(in2, out2, ck2,
        Seq("--fp_index", out1))
      println(f"drain=$k%2d wall=$wall%6.1f s stateRows=$st%9d " +
        f"admitted=${rows - prevRows}%8d totalOut=$rows%9d")
      prevRows = rows
    }
    // the handoff claim: NOTHING in run 2's output carries a run-1 fp
    val leaked = spark.read.parquet(out2).select("fp")
      .join(spark.read.parquet(out1).select("fp"), Seq("fp"), "left_semi")
      .count()
    println(s"run-1 fingerprints admitted by run 2: $leaked")
    require(leaked == 0L, s"fp_index handoff leaked $leaked duplicates")
    println("fp_index handoff holds: run-1 duplicates rejected on first arrival")
    spark.stop()
  }
}
