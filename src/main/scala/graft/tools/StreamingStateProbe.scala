package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** State-bound probe for the streaming operators (round 8): drives
  * ≥1M events through `streamingDedupExact` and `sessionizeStream` in
  * micro-batches and samples the state store's row count after every
  * batch (`lastProgress.stateOperators.numRowsTotal`).
  *
  * The claim under test is the watermark contract: state must plateau
  * at the HORIZON's worth of live keys, not grow with total events —
  * the difference between "runs forever at 100 TB/day" and "OOMs on
  * day two".
  *
  *  - dedup: every event carries a UNIQUE fingerprint (the worst case
  *    — nothing is ever a duplicate, every row inserts state); event
  *    time advances 100 ms/event with a 60 s watermark, so the horizon
  *    holds ~600 live fingerprints. Expected: state ≈ horizon + one
  *    batch's not-yet-expired tail, flat across batches.
  *  - sessionize: a rotating pool of 1 000 users, bursts separated by
  *    idle gaps longer than `gapMs`, so sessions keep closing via
  *    event-time timeout. Expected: state ≤ pool size, flat.
  *
  * Usage: runMain graft.tools.StreamingStateProbe [events] [batches]
  */
object StreamingStateProbe {
  def main(args: Array[String]): Unit = {
    val totalEvents = args.headOption.map(_.toInt).getOrElse(1200000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(12)
    val perBatch = totalEvents / nBatches
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum)
        .getOrElse(-1L)

    println(s"# Streaming state-bound probe: $totalEvents events in " +
      s"$nBatches micro-batches of $perBatch")
    println("# dedup: unique fp per event (worst case), ts +100ms/event, " +
      "watermark 60s -> horizon ~600 live rows")

    // ---------------- dedup ----------------
    {
      val input = MemoryStream[(java.sql.Timestamp, Long, String)]
      val df = input.toDF().toDF("ts", "doc_id", "fp")
      val dedup = StreamingOps.streamingDedupExact(df, "ts", "fp", "60 seconds")
      val q = dedup.writeStream.format("noop").outputMode("append").start()
      try {
        var admitted = 0L
        for (b <- 0 until nBatches) {
          val rows = (0 until perBatch).map { i =>
            val idx = b.toLong * perBatch + i
            (new java.sql.Timestamp(1700000000000L + idx * 100L), idx,
              s"fp-$idx")
          }
          input.addData(rows)
          q.processAllAvailable()
          val p = q.lastProgress
          admitted += Option(p).map(_.sink.numOutputRows).getOrElse(0L)
          println(f"dedup batch=$b%2d events=${(b + 1).toLong * perBatch}%9d " +
            f"stateRows=${stateRows(q)}%8d")
        }
      } finally q.stop()
    }

    // ---------------- sessionize ----------------
    println("# sessionize: 1000-user pool, bursts then >gap idle; " +
      "gap 30s, watermark 60s -> state <= pool size")
    locally {
      val input = MemoryStream[StreamingOps.Click]
      val out = StreamingOps.sessionizeStream(input.toDS(),
        gapMs = 30000L, watermarkDelay = "60 seconds")
      val q = out.writeStream.format("noop").outputMode("append").start()
      try {
        for (b <- 0 until nBatches) {
          val rows = (0 until perBatch).map { i =>
            val idx = b.toLong * perBatch + i
            val user = s"u${idx % 1000}"
            // each user's consecutive events arrive ~100s apart in
            // event time (1000 users x 100ms spacing), far past the
            // 30s gap -> every burst is its own session and closes
            StreamingOps.Click(user,
              new java.sql.Timestamp(1700000000000L + idx * 100L))
          }
          input.addData(rows)
          q.processAllAvailable()
          println(f"sess  batch=$b%2d events=${(b + 1).toLong * perBatch}%9d " +
            f"stateRows=${stateRows(q)}%8d")
        }
      } finally q.stop()
    }
    spark.stop()
  }
}
