package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume probe for STREAMING tokenize (`tokenize --follow`, r15):
  * drives the real CLI verb — the map-only `BpeDocTokenIds` kernel
  * behind a checkpointed AvailableNow parquet source/sink — over ≥1M
  * documents arriving as fresh-file increments, each drained by its
  * OWN CLI invocation (the production usage: a cron-invoked drain
  * against an append-only crawl directory, emitting trainer-ready id
  * sequences against a PINNED vocabulary).
  *
  * Claims under test:
  *   1. STATELESS: the dataflow has no state store at all (asserted
  *      via a StreamingQueryListener — zero state rows ever) — the
  *      r15 id kernel is one codegen'd column, no vocab join, no
  *      aggregation, which is precisely what makes the tokenizer
  *      streamable; the r14 join form would have dragged a
  *      corpus-vocabulary join into every micro-batch;
  *   2. flat per-drain wall: each drain pays for ITS increment's scan,
  *      not for history (no state to load, no index to grow);
  *   3. stream == batch: the accumulated output equals one batch
  *      `--out_ids` pass over the full corpus with the same pinned
  *      vocab, doc-for-doc and id-for-id (md5 of the joined id string
  *      per doc, compared set-exact both directions).
  *
  * Usage: tools/run_main.sh graft.tools.TokenizeStreamProbe
  *        [docs] [increments] [merges] (defaults 1,200,000 x 12,
  *        512 merges learned from the first increment).
  */
object TokenizeStreamProbe {
  def main(args: Array[String]): Unit = {
    val totalDocs = args.headOption.map(_.toLong).getOrElse(1200000L)
    val nInc = args.lift(1).map(_.toInt).getOrElse(12)
    val nMerges = args.lift(2).map(_.toInt).getOrElse(512)
    val perInc = totalDocs / nInc
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("tokstream").toString
    val in = s"$root/in"
    val out = s"$root/ids"
    val ck = s"$root/ck"
    val mergesF = s"$root/merges.tsv"
    val vocabF = s"$root/vocab.tsv"

    val sawState = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          sawState.addAndGet(e.progress.stateOperators.map(_.numRowsTotal).sum)
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    // 31-70 words/doc, each word THREE xxhash64-mixed syllables (up to
    // 64^3 distinct words — single-syllable words would cap the
    // learnable merge table at 64: every word is one char pair)
    val syls = (for (a <- "ktmnsrlp"; b <- "aeiouywz") yield s"$a$b")
      .map(s => s"'$s'").mkString("array(", ",", ")")
    def writeInc(inc: Int): Unit =
      spark.range(inc * perInc, (inc + 1) * perInc)
        .select(col("id").as("doc_id"),
          expr(s"""array_join(transform(
              sequence(1, 31 + cast(pmod(id, 40) AS int)),
              j -> concat(
                element_at($syls,
                  cast(pmod(xxhash64(id, j), 64) AS int) + 1),
                element_at($syls,
                  cast(pmod(xxhash64(id, j) div 64, 64) AS int) + 1),
                element_at($syls,
                  cast(pmod(xxhash64(id, j) div 4096, 64) AS int) + 1))),
            ' ')""").as("text"))
        .coalesce(4)
        .write.mode("append").parquet(in)

    println(s"# streaming tokenize probe: $totalDocs docs, $nInc fresh-file " +
      s"increments of $perInc; $nMerges merges pinned from increment 0")

    // pin the tokenizer from the first increment (the seed corpus): a
    // --follow consumer ships merges.tsv + vocab.tsv, never re-learns
    writeInc(0)
    val t0 = System.nanoTime()
    require(graft.cli.Cli.run(spark, Seq("tokenize", "--in", in,
      "--merges", nMerges.toString, "--out_merges", mergesF,
      "--out_vocab", vocabF)) == 0)
    val learned = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(mergesF)).size
    require(learned == nMerges,
      s"fixture too poor to learn $nMerges merges (got $learned)")
    println(f"pin: learned $learned merges from increment 0 in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s -> $mergesF, $vocabF")

    val follow = Seq("tokenize", "--follow", "--in", in,
      "--merges_file", mergesF, "--vocab_file", vocabF,
      "--out_ids", out, "--checkpoint", ck)
    var prevRows = 0L
    var prevIds = 0L
    val walls = Array.ofDim[Double](nInc)
    for (k <- 0 until nInc) {
      if (k > 0) writeInc(k)
      val t = System.nanoTime()
      require(graft.cli.Cli.run(spark, follow) == 0, "tokenize --follow failed")
      walls(k) = (System.nanoTime() - t) / 1e9
      val acc = spark.read.parquet(out)
        .agg(count(lit(1)), coalesce(sum("n_tokens"), lit(0L))).head()
      val (rows, ids) = (acc.getLong(0), acc.getLong(1))
      println(f"drain=$k%2d docsSeen=${(k + 1) * perInc}%9d " +
        f"wall=${walls(k)}%6.1f s emitted=${rows - prevRows}%8d docs / " +
        f"${(ids - prevIds) / walls(k) / 1e6}%5.1f M ids/s  totalOut=$rows%9d")
      prevRows = rows
      prevIds = ids
    }
    require(sawState.get() == 0L,
      s"dataflow grew a state store (${sawState.get()} rows) - " +
        "the id kernel must be stateless")
    println("stateless holds: zero state-store rows across every drain")
    // flat wall, loosely (the host is noisy): no steady-state drain
    // past 4x the steady-state median
    val steady = walls.drop(1).sorted
    val median = steady(steady.length / 2)
    require(walls.drop(1).forall(_ <= median * 4),
      s"drain wall not flat: ${walls.mkString(", ")} (median $median)")
    println(f"per-drain wall flat: median $median%.1f s, " +
      f"max ${walls.drop(1).max}%.1f s over ${nInc - 1} steady drains")

    // stream == batch, doc-for-doc: one batch pass with the same
    // pinned vocab must reproduce every id sequence exactly
    val outB = s"$root/ids_batch"
    require(graft.cli.Cli.run(spark, Seq("tokenize", "--in", in,
      "--merges_file", mergesF, "--vocab_file", vocabF,
      "--out_ids", outB)) == 0)
    def fp(dir: String) = spark.read.parquet(dir)
      .select(col("doc_id"), md5(array_join(col("token_ids"), ",")).as("fp"))
    val diff = fp(out).exceptAll(fp(outB)).count() +
      fp(outB).exceptAll(fp(out)).count()
    require(diff == 0L, s"stream/batch diverged on $diff doc fingerprints")
    println(s"stream == batch: $prevRows docs, per-doc id md5 set-exact " +
      "both directions")

    // clean up on success
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) { val l = f.listFiles(); if (l != null) l.foreach(rm) }
      f.delete()
    }
    rm(new java.io.File(root))
    println("probe data deleted")
    spark.stop()
  }
}
