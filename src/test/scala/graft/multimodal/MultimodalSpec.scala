package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = Seq(
      Row("a", "image", "fakepng-bytes-1".getBytes("UTF-8"), "image/png",
        Integer.valueOf(4), Integer.valueOf(4), null),
      Row("b", "audio", "fakewav-bytes-22".getBytes("UTF-8"), "audio/wav",
        null, null, java.lang.Long.valueOf(1200L)),
      Row("c", "image", null, "image/png", null, null, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("extractFeatures appends byte_len/content_hash/feature; null payload → nulls") {
    val out = Multimodal.extractFeatures(media, "payload",
      new Multimodal.StubDecoder(4), batchSize = 2)
    assert(out.columns.contains("feature"))
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("a").getAs[Long]("byte_len") == 15L)
    assert(byId("a").getAs[scala.collection.Seq[Float]]("feature").length == 4)
    assert(byId("c").isNullAt(out.columns.indexOf("feature")))
    // deterministic
    val again = Multimodal.extractFeatures(media, "payload",
      new Multimodal.StubDecoder(4)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(byId("a").getAs[scala.collection.Seq[Float]]("feature") ==
      again("a").getAs[scala.collection.Seq[Float]]("feature"))
  }

  test("column-expression metadata: byteLen / contentMd5") {
    val out = media.select(col("id"),
      Multimodal.byteLen(col("payload")).as("len"),
      Multimodal.contentMd5(col("payload")).as("h")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("b").getAs[Int]("len") == 16)
    assert(out("a").getAs[String]("h").length == 32)
    assert(out("c").getAs[Any]("h") == null)
  }

  test("explodeFrames expands rows per frame and drops the payload column") {
    val out = Multimodal.explodeFrames(media, "payload",
      new Multimodal.StubFrameSampler(4), maxFrames = 3)
    assert(!out.columns.contains("payload"))
    assert(out.columns.takeRight(2).toSeq == Seq("frame_idx", "frame"))
    val byId = out.collect().groupBy(_.getString(0))
    assert(byId("a").length == 3 && byId("b").length == 3)
    assert(!byId.contains("c")) // null payload → zero frame rows
    assert(byId("a").map(_.getInt(out.columns.length - 2)).sorted.toSeq == Seq(0, 1, 2))
    // deterministic: same payload → same frame features
    val again = Multimodal.explodeFrames(media, "payload",
      new Multimodal.StubFrameSampler(4), maxFrames = 3).collect()
      .groupBy(_.getString(0))
    assert(byId("a").map(_.getSeq[Float](out.columns.length - 1)).toSeq ==
      again("a").map(_.getSeq[Float](out.columns.length - 1)).toSeq)
  }

  test("resize rewrites payload in place and sets width/height metadata") {
    val out = Multimodal.resize(media, "payload", 8, 2,
      new Multimodal.StubResizer, batchSize = 2)
    assert(out.schema == media.schema, "resize must not change the schema")
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("a").getAs[Array[Byte]]("payload").length == 16)
    assert(byId("a").getAs[Int]("width") == 8 && byId("a").getAs[Int]("height") == 2)
    // null payload stays null, metadata nulled too
    assert(byId("c").isNullAt(out.columns.indexOf("payload")))
    assert(byId("c").isNullAt(out.columns.indexOf("width")))
    // other columns ride through untouched
    assert(byId("b").getAs[Long]("duration_ms") == 1200L)
  }

  test("dropBinaryColumns removes payloads unless kept (util.py:357-368)") {
    assert(!Multimodal.dropBinaryColumns(media).columns.contains("payload"))
    assert(Multimodal.dropBinaryColumns(media, keep = Set("payload"))
      .columns.contains("payload"))
  }

  test("pcmFeatures: real 16-bit LE parsing, sign-aware ZCR, exact RMS, odd tail ignored") {
    import spark.implicits._
    // samples: +1000, -2000, +3000, -32768 (LE bytes), plus a trailing
    // odd byte that must be ignored
    def le(s: Int): Seq[Byte] =
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    val payload = (le(1000) ++ le(-2000) ++ le(3000) ++ le(-32768) ++
      Seq(0x7f.toByte)).toArray
    val df = Seq(("a", payload), ("nul", null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val out = Multimodal.pcmFeatures(df, "payload", batchSize = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(a.fieldIndex("n_samples")) == 4L)
    // every adjacent pair flips sign → 3 crossings
    assert(a.getLong(a.fieldIndex("n_zero_cross")) == 3L)
    assert(a.getLong(a.fieldIndex("peak")) == 32768L)
    val expectRms = math.sqrt(
      (1000.0 * 1000 + 2000.0 * 2000 + 3000.0 * 3000 + 32768.0 * 32768) / 4)
    assert(math.abs(a.getDouble(a.fieldIndex("rms")) - expectRms) < 1e-9)
    // null payload → null features
    assert(out("nul").isNullAt(out("nul").fieldIndex("n_samples")))
  }
}
