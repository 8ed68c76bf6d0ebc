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

  test("rgbFeatures: channel means and BT.601 luminance on a known 2x2 bitmap") {
    import spark.implicits._
    // pixels: red, green, blue, white (RGB888 row-major)
    val img = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val short = Array[Byte](1, 2, 3) // truncated frame → null features
    val df = Seq(("ok", img), ("bad", short)).toDF("id", "payload")
    val out = Multimodal.rgbFeatures(df, "payload", width = 2, height = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val ok = out("ok")
    assert(ok.getDouble(ok.fieldIndex("r_mean")) == 127.5)
    assert(ok.getDouble(ok.fieldIndex("g_mean")) == 127.5)
    assert(ok.getDouble(ok.fieldIndex("b_mean")) == 127.5)
    // white pixel: (299+587+114)*255 = 255000 per-mille
    assert(ok.getLong(ok.fieldIndex("lum_max_pm")) == 255000L)
    val expectMean = 255.0 * (299 + 587 + 114 + 1000) / 4
    assert(ok.getDouble(ok.fieldIndex("lum_mean_pm")) == expectMean)
    assert(out("bad").isNullAt(out("bad").fieldIndex("r_mean")))
  }

  test("RawRgbResizer: exact nearest-neighbor pixels, up and down") {
    val img = Array[Byte]( // 2x2: px(0,0)=A px(1,0)=B px(0,1)=C px(1,1)=D
      10, 11, 12,  20, 21, 22,
      30, 31, 32,  40, 41, 42)
    val rz = new Multimodal.RawRgbResizer(2, 2)
    // downscale to 1x1 keeps the top-left source pixel (NN floor map)
    val down = rz.resizeBatch(Seq(img), 1, 1).head
    assert(down._1.toSeq == Seq[Byte](10, 11, 12) && down._2 == 1)
    // upscale to 4x4 replicates each source pixel into a 2x2 block
    val up = rz.resizeBatch(Seq(img), 4, 4).head._1
    assert(up.length == 48)
    def px(x: Int, y: Int): Seq[Byte] =
      up.slice((y * 4 + x) * 3, (y * 4 + x) * 3 + 3).toSeq
    assert(px(0, 0) == Seq[Byte](10, 11, 12) && px(1, 1) == Seq[Byte](10, 11, 12))
    assert(px(2, 0) == Seq[Byte](20, 21, 22) && px(3, 3) == Seq[Byte](40, 41, 42))
    assert(px(0, 2) == Seq[Byte](30, 31, 32))
    // corrupt (short) payload → null passthrough
    assert(rz.resizeBatch(Seq(Array[Byte](1, 2)), 2, 2).head._1 == null)
  }
}
