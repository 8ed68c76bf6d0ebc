package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The composed STREAMING curation front-end (quality → exact dedup →
  * leak-free split as one incremental dataflow): proves the stream
  * admits exactly the batch prefix's survivors when replayed in
  * doc_id order, and that the incremental form rejects fingerprints
  * already in a prior batch run's index. */
class CurationStreamSpec extends SparkSpec {

  private def goodText(seed: Int): String =
    (0 until 30).map(i => s"tok${seed}x$i").mkString(" ")

  private def t(m: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 01:$m%02d:00")

  /** 40 crafted docs: every 7th-ish fails quality; every 5th-ish is a
    * trim/case dup of the doc EIGHT positions earlier (one micro-batch
    * back, so first-wins is deterministic), the rest distinct. */
  private def rows: Seq[(java.sql.Timestamp, Long, String, String)] =
    (0 until 40).map { i =>
      val text =
        if (i % 7 == 3) "too short"
        else if (i % 5 == 4 && i >= 8) " " + goodText(i - 8).toUpperCase
        else goodText(i)
      (t(i), i.toLong, text, s"src${i % 3}")
    }

  test("streaming prefix == batch prefix when the stream replays in doc_id order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchDf = rows.toDF("ts", "doc_id", "text", "source")
    // the batch rule: quality → keep-min exact dedup → train split
    val expected = Curation.keepTrainSplit(Curation.exactDedup(
        Curation.qualityFilter(batchDf.drop("ts"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val input = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    val out = Curation.streamingPrefix(
      input.toDF().toDF("ts", "doc_id", "text", "source"),
      "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("scur")
      .outputMode("append").start()
    try {
      // replay in doc_id order, 8 docs per micro-batch: each dup
      // arrives one batch after its original (and within the
      // 10-minute dedup horizon — batches step 8 minutes)
      rows.grouped(8).foreach { g =>
        input.addData(g: _*); q.processAllAvailable()
      }
      val got = spark.table("scur").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(got == expected,
        s"stream admitted $got, batch prefix keeps $expected")
      assert(got.nonEmpty && got.size < 40) // rules actually fired
      // the carried columns a downstream batch finisher needs —
      // including text (LSH near-dedup re-tokenizes it) and fp (the
      // next incremental run's index)
      assert(spark.table("scur").columns.toSet ==
        Set("ts", "doc_id", "source", "text", "n_tok", "fp"))
    } finally q.stop()
  }

  test("incremental form: fingerprints in a prior run's index are rejected on first arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the materialized fp set of a prior batch run: doc 0's content
    val index = Seq(goodText(0)).toDF("text")
      .select(md5(trim(lower(col("text")))).as("fp"))
    val input = MemoryStream[(java.sql.Timestamp, Long, String, String)]
    val out = Curation.streamingPrefix(
      input.toDF().toDF("ts", "doc_id", "text", "source"),
      "ts", "10 minutes", fpIndex = Some(index), split = "all")
    val q = out.writeStream.format("memory").queryName("scuri")
      .outputMode("append").start()
    try {
      input.addData(
        (t(0), 100L, goodText(0), "src0"),  // in the index → rejected
        (t(1), 101L, goodText(1), "src0"))  // novel → admitted
      q.processAllAvailable()
      val got = spark.table("scuri").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(got == Set(101L), s"got $got")
    } finally q.stop()
  }
}
