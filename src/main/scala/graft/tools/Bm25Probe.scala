package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueriesCommon

/** Round-10 ask #2: where do q_bm25's seconds go at 15.7 GiB — the
  * only data-cost weak member with no stage-metrics artifact.
  *
  * The shipped shape (QueriesExt6.bm25Scores) is: tokenize+explode the
  * corpus → broadcast probe-vocab semi-join prunes the stream → ONE
  * exchange on tok (grouping + df/qids windows share it) → score →
  * top-10 per query. Hypotheses this probe separates:
  *
  *  - PHASES: the corpus text is tokenized TWICE (the token stream,
  *    and the (n, avgdl) stats scan) — `stats` times the second scan
  *    alone; if it's a large share, the fix is a per-corpus statistic
  *    computed at ingest (exactly how a warehouse treats row counts),
  *    not a smarter query.
  *  - DF-CAP (impact pruning / WAND territory, SURVEY §7.6): drop
  *    probe tokens whose corpus df exceeds a cap before the corpus
  *    semi-join. idf ln((N-df+0.5)/(df+0.5)+1) ≈ 0 for stopword-grade
  *    tokens, so a cap changes scores only at the ~1e-6 rounding
  *    grain IF capped tokens score no surviving pair differently —
  *    the probe REPORTS result divergence instead of assuming it.
  *  - EXCHANGE FLOOR: stage metrics (shuffle GB / records / spill /
  *    CPU) under parts {32, 64} say whether the one corpus exchange
  *    is at its semantic minimum or carrying sizing debt.
  *
  * Usage: runMain graft.tools.Bm25Probe <dir> [passes]
  */
object Bm25Probe {

  private def toksArr = "filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')"

  /** The stats scan alone — the (n, avgdl) 1-row aggregate. */
  def statsOnly(s: SparkSession, dir: String): DataFrame =
    QueriesCommon.table(s, dir, "documents")
      .select(expr(s"size($toksArr)").cast("double").as("dl0"))
      .agg(count(lit(1)).cast("double").as("n"), avg("dl0").as("avgdl"))

  /** The probe-vocab scan alone. */
  def vocabOnly(s: SparkSession, dir: String): DataFrame =
    QueriesCommon.table(s, dir, "documents").filter(col("doc_id") < 5)
      .select(explode(expr(s"transform($toksArr, x -> xxhash64(x))")).as("tok"))
      .distinct()

  /** Shipped shape with an optional df-cap on the PROBE VOCAB: tokens
    * present in more than `cap` corpus docs are dropped from the
    * query side before the corpus semi-join — the WAND-ish skip of
    * stopword-grade postings. cap <= 0 = shipped (no cap). */
  def bm25(s: SparkSession, dir: String, dfCap: Long): DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val docs = QueriesCommon.fannedTable(s, dir, "documents")
    val toks = docs
      .select(col("doc_id"),
        expr(s"size($toksArr)").cast("double").as("dl"),
        expr(s"transform($toksArr, x -> xxhash64(x))").as("__harr"))
      .select(col("doc_id"), col("dl"), explode(col("__harr")).as("tok"))
    val probeVocab0 = vocabOnly(s, dir)
    val probeVocab =
      if (dfCap <= 0) probeVocab0
      else {
        // df of each probe token measured on the corpus stream once,
        // driver-collected (the probe vocab is tiny); at 100 TB this
        // is a dictionary statistic the ingest maintains
        val dfs = toks.join(broadcast(probeVocab0), Seq("tok"), "left_semi")
          .groupBy("tok").agg(countDistinct("doc_id").as("df"))
        dfs.filter(col("df") <= dfCap).select("tok")
      }
    val stats = statsOnly(s, dir)
    val wTok = Window.partitionBy("tok")
    toks.join(broadcast(probeVocab), Seq("tok"), "left_semi")
      .repartition(col("tok"))
      .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(wTok))
      .withColumn("qids",
        collect_set(when(col("doc_id") < 5, col("doc_id"))).over(wTok))
      .select(explode(col("qids")).as("query_id"), col("doc_id"),
        col("tf").cast("double").as("tf"), col("dl"),
        col("df").cast("double").as("df"))
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "doc_id")
      .agg(sum(
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        .as("score"))
      .withColumn("rn", row_number().over(Window.partitionBy("query_id")
        .orderBy(round(col("score"), 6).desc, col("doc_id"))))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("doc_id"),
        round(col("score"), 6).as("bm25"))
      .orderBy("query_id", "doc_id")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bigdata15")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val agg = new Object {
      var shufWrite = 0L; var shufRead = 0L; var recsWritten = 0L
      var memSpill = 0L; var diskSpill = 0L; var cpuMs = 0L; var runMs = 0L
      def reset(): Unit = { shufWrite = 0; shufRead = 0; recsWritten = 0
        memSpill = 0; diskSpill = 0; cpuMs = 0; runMs = 0 }
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          agg.shufWrite += m.shuffleWriteMetrics.bytesWritten
          agg.recsWritten += m.shuffleWriteMetrics.recordsWritten
          agg.shufRead += m.shuffleReadMetrics.totalBytesRead
          agg.memSpill += m.memoryBytesSpilled
          agg.diskSpill += m.diskBytesSpilled
          agg.cpuMs += m.executorCpuTime / 1000000
          agg.runMs += m.executorRunTime
        }
      }
    })

    def timed(label: String)(act: => Unit): Unit =
      for (_ <- 1 to passes) {
        agg.synchronized(agg.reset())
        val t0 = System.nanoTime()
        act
        val t = (System.nanoTime() - t0) / 1e9
        val gb = (x: Long) => f"${x / 1e9}%.2f"
        println(f"$label%-16s wall=${t}%7.2f s  shufW=${gb(agg.shufWrite)} GB " +
          f"shufR=${gb(agg.shufRead)} GB recs=${agg.recsWritten / 1000000}%dM " +
          f"spillMem=${gb(agg.memSpill)} GB spillDisk=${gb(agg.diskSpill)} GB " +
          f"cpu=${agg.cpuMs / 1000}%ds run=${agg.runMs / 1000}%ds")
      }

    // phase split: the two extra corpus scans vs the main pipeline
    timed("phase:stats") { statsOnly(spark, dir).collect() }
    timed("phase:vocab") { vocabOnly(spark, dir).collect() }

    // cumulative sub-plan split of the main pipeline: tokenize+explode
    // alone, + semi prune, + the tok exchange & tf aggregate, + the
    // df/qmask windows — the first arm whose wall ≈ the full query is
    // the cost center
    {
      val docs = QueriesCommon.fannedTable(spark, dir, "documents")
      val toks = docs
        .select(col("doc_id"),
          expr(s"size($toksArr)").cast("double").as("dl"),
          expr(s"transform($toksArr, x -> xxhash64(x))").as("__harr"))
        .select(col("doc_id"), col("dl"), explode(col("__harr")).as("tok"))
      val vocab = vocabOnly(spark, dir)
      timed("cum:explode") { toks.count() }
      val pruned = toks.join(broadcast(vocab), Seq("tok"), "left_semi")
      timed("cum:+semi") { pruned.count() }
      val tf = pruned.repartition(col("tok"))
        .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      timed("cum:+tf") { tf.count() }
      val wT = Window.partitionBy("tok")
      timed("cum:+windows") {
        tf.withColumn("df", count(lit(1)).over(wT))
          .withColumn("qm", sum(when(col("doc_id") < 5,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id AS INT))"))
            .otherwise(0L)).over(wT))
          .count()
      }
    }
    timed("shipped") {
      graft.SparkEntry.queries("q_bm25")(spark, dir).count()
    }

    // df-cap A/B: measure wall AND result divergence per cap
    val base = bm25(spark, dir, 0).collect().map(_.toString).toSeq
    for (cap <- Seq(0L, 200000L, 50000L)) {
      timed(s"dfcap=$cap") { bm25(spark, dir, cap).count() }
      if (cap > 0) {
        val capped = bm25(spark, dir, cap).collect().map(_.toString).toSeq
        val diverged = base.zipAll(capped, "-", "-").count(p => p._1 != p._2)
        println(s"# dfcap=$cap: ${base.size} rows, $diverged diverged vs shipped")
      }
    }

    // partition-count sensitivity on the shipped shape
    for (parts <- Seq(64, 32)) {
      System.setProperty("graft.branch.spark.sql.shuffle.partitions",
        parts.toString)
      timed(s"shipped p=$parts") {
        graft.SparkEntry.queries("q_bm25")(spark, dir).count()
      }
    }
    System.clearProperty("graft.branch.spark.sql.shuffle.partitions")
    spark.stop()
  }
}
