package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns next to typed metadata,
  * and per-row decode/feature-extraction runs batched inside
  * `mapPartitions` (the JVM analog of `mapInPandas`: the batch shape,
  * schema contract and partitioning are identical; only the decode
  * kernel differs).
  *
  * The decode step itself is STUBBED — the real image/audio libraries
  * are not in this container — behind `MediaDecoder`, with a
  * deterministic fake (`StubDecoder`) that derives features from the
  * raw bytes. Swapping in a JNI/FFI decoder changes no Spark plumbing.
  */
object Multimodal {

  /** Canonical multimodal row schema: opaque payload + typed metadata.
    * Partition by `modality` at rest so a scan for one modality prunes
    * the rest (100 TB: never read video bytes for a text query). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Output features appended by `extractFeatures`. */
  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = true),
    StructField("content_hash", LongType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** Batched media decode kernel. Implementations must be Serializable
    * and cheap to construct (one per task). */
  trait MediaDecoder extends Serializable {
    def featureDims: Int
    /** Decode a batch of payloads into fixed-width feature vectors.
      * Order-preserving; null payload → null feature. */
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]]
  }

  /** Deterministic fake decoder: features from byte statistics. Stands
    * in for image-resize / audio-frame-sample / video-keyframe kernels. */
  final class StubDecoder(val featureDims: Int) extends MediaDecoder {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map { p =>
        if (p == null) null
        else {
          val v = new Array[Float](featureDims)
          var i = 0
          while (i < p.length) {
            v(i % featureDims) += (p(i) & 0xff) / 255.0f
            i += 1
          }
          v
        }
      }
  }

  /** Append (byte_len, content_hash, feature) columns, decoding in
    * batches of `batchSize` per partition. The iterator streams: at
    * most one batch of payload bytes is resident per task — the
    * property that keeps 100 TB of video from OOMing an executor. */
  def extractFeatures(df: DataFrame, payloadCol: String,
      decoder: MediaDecoder, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ featureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val payloads = batch.map(r =>
          if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx))
        val feats = decoder.decodeBatch(payloads)
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          val p = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
          val len = if (p == null) null else java.lang.Long.valueOf(p.length.toLong)
          val hash = if (p == null) null
            else java.lang.Long.valueOf(
              scala.util.hashing.MurmurHash3.bytesHash(p).toLong)
          Row.fromSeq(r.toSeq ++ Seq(len, hash, f))
        }
      }
    }(enc)
  }

  /** REAL audio kernel — no codec library needed: the payload is
    * interpreted as 16-bit little-endian signed PCM (the raw WAV/PCM
    * frame layout; a trailing odd byte is ignored) and the standard
    * first-pass audio features are computed with integer-exact
    * arithmetic: sample count, RMS (√(Σs²/n) — Σs² stays in a Long,
    * exact for any realistic clip, so the double sqrt is bit-stable
    * across engines), zero-crossing count (strict sign flips — the
    * voiced/unvoiced discriminator), and peak |amplitude|. Same
    * batched-mapPartitions shape as `extractFeatures`: one batch of
    * payloads resident per task. Compressed codecs (MP3/JPEG/H.264)
    * remain behind the stub decoders — the container ships no codec
    * libs — but raw-format kernels are real compute, not fakes. */
  def pcmFeatures(df: DataFrame, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val pcmSchema = StructType(Seq(
      StructField("n_samples", LongType), StructField("rms", DoubleType),
      StructField("n_zero_cross", LongType), StructField("peak", LongType)))
    val outSchema = StructType(df.schema.fields ++ pcmSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          if (r.isNullAt(idx)) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
          else {
            val b = r.getAs[Array[Byte]](idx)
            val n = b.length / 2
            var i = 0
            var sumSq = 0L; var zc = 0L; var peak = 0L; var prev = 0
            while (i < n) {
              val s = ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt
              sumSq += s.toLong * s
              if (i > 0 && s * prev < 0) zc += 1
              val a = math.abs(s.toLong); if (a > peak) peak = a
              prev = s
              i += 1
            }
            val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
            Row.fromSeq(r.toSeq ++ Seq(
              java.lang.Long.valueOf(n.toLong),
              java.lang.Double.valueOf(rms),
              java.lang.Long.valueOf(zc),
              java.lang.Long.valueOf(peak)))
          }
        }
      }
    }(enc)
  }

  /** REAL image kernel for raw RGB888 bitmaps (w·h·3 bytes,
    * row-major, no header — the decoded-frame layout every codec
    * produces): per-channel means and ITU-R BT.601 luminance
    * (299R+587G+114B per mille — integer weights, so every sum stays
    * in a Long and the double means are bit-stable across engines).
    * Payloads shorter than w·h·3 yield null features (a truncated
    * frame is corrupt, not zero-padded). Same batched shape as
    * `pcmFeatures`. */
  def rgbFeatures(df: DataFrame, payloadCol: String, width: Int,
      height: Int, batchSize: Int = 64): DataFrame = {
    val rgbSchema = StructType(Seq(
      StructField("r_mean", DoubleType), StructField("g_mean", DoubleType),
      StructField("b_mean", DoubleType),
      // luminance stays in per-mille units (the integer weight scale):
      // sums are Longs and the /n mean has so few fractional bits that
      // decimal rounding can never land on a tie — cross-engine stable
      StructField("lum_mean_pm", DoubleType),
      StructField("lum_max_pm", LongType)))
    val outSchema = StructType(df.schema.fields ++ rgbSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    val need = width * height * 3
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val p = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
          if (p == null || p.length < need)
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
          else {
            var i = 0
            var rs = 0L; var gs = 0L; var bs = 0L; var lumMax = 0L
            val n = width * height
            while (i < n) {
              val rr = p(3 * i) & 0xff
              val gg = p(3 * i + 1) & 0xff
              val bb = p(3 * i + 2) & 0xff
              rs += rr; gs += gg; bs += bb
              val lum = 299L * rr + 587L * gg + 114L * bb
              if (lum > lumMax) lumMax = lum
              i += 1
            }
            val lumSum = 299L * rs + 587L * gs + 114L * bs
            Row.fromSeq(r.toSeq ++ Seq(
              java.lang.Double.valueOf(rs.toDouble / n),
              java.lang.Double.valueOf(gs.toDouble / n),
              java.lang.Double.valueOf(bs.toDouble / n),
              java.lang.Double.valueOf(lumSum.toDouble / n),
              java.lang.Long.valueOf(lumMax)))
          }
        }
      }
    }(enc)
  }

  /** REAL nearest-neighbor resize for raw RGB888 bitmaps — the one
    * image transform that needs no codec: source pixel (⌊x·sw/w⌋,
    * ⌊y·sh/h⌋) for each target pixel, the standard NN mapping. Payloads
    * that aren't sw·sh·3 bytes pass through as null (corrupt frame). */
  final class RawRgbResizer(srcW: Int, srcH: Int) extends MediaResizer {
    def resizeBatch(payloads: Seq[Array[Byte]], w: Int, h: Int)
        : Seq[(Array[Byte], Integer, Integer)] =
      payloads.map { p =>
        if (p == null || p.length < srcW * srcH * 3)
          (null, null, null): (Array[Byte], Integer, Integer)
        else {
          val out = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            val sy = y * srcH / h
            var x = 0
            while (x < w) {
              val sx = x * srcW / w
              val si = (sy * srcW + sx) * 3
              val di = (y * w + x) * 3
              out(di) = p(si); out(di + 1) = p(si + 1); out(di + 2) = p(si + 2)
              x += 1
            }
            y += 1
          }
          (out, Integer.valueOf(w), Integer.valueOf(h))
        }
      }
  }

  /** Batched frame sampler for video/audio payloads: one payload →
    * up to `maxFrames` per-frame feature vectors. */
  trait FrameSampler extends Serializable {
    def frameDims: Int
    def sampleFrames(payload: Array[Byte], maxFrames: Int): Seq[Array[Float]]
  }

  /** Deterministic fake sampler: splits the payload into `maxFrames`
    * contiguous segments and features each — stands in for ffmpeg-style
    * keyframe extraction; the Spark-side row expansion is real. */
  final class StubFrameSampler(val frameDims: Int) extends FrameSampler {
    def sampleFrames(p: Array[Byte], maxFrames: Int): Seq[Array[Float]] = {
      if (p == null || p.isEmpty) Seq.empty
      else {
        val n = math.min(maxFrames, math.max(1, p.length / frameDims))
        val seg = math.max(1, p.length / n)
        (0 until n).map { f =>
          val v = new Array[Float](frameDims)
          var i = f * seg
          val end = math.min(p.length, (f + 1) * seg)
          while (i < end) { v((i - f * seg) % frameDims) += (p(i) & 0xff) / 255.0f; i += 1 }
          v
        }
      }
    }
  }

  /** Explode each media row into per-frame rows (frame_idx, frame).
    * The payload column is DROPPED from the output on purpose: frame
    * rows must never replicate the source bytes ×frames — at 100 TB of
    * video that alone decides whether the job runs. Empty/null
    * payloads produce zero rows (filter upstream to keep them). */
  def explodeFrames(df: DataFrame, payloadCol: String,
      sampler: FrameSampler, maxFrames: Int): DataFrame = {
    val keptFields = df.schema.fields.filterNot(_.name == payloadCol)
    val outSchema = StructType(keptFields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", ArrayType(FloatType), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    val keptIdx = df.schema.fields.indices.filterNot(_ == idx)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val kept = keptIdx.map(r.get)
        sampler.sampleFrames(p, maxFrames).iterator.zipWithIndex.map {
          case (f, i) => Row.fromSeq(kept ++ Seq(i, f))
        }
      }
    }(enc)
  }

  /** Batched payload→payload transform (the image-resize shape): a new
    * binary payload plus updated width/height metadata. */
  trait MediaResizer extends Serializable {
    /** Transform a batch of payloads to (payload, width, height).
      * Order-preserving; null payload → (null, null, null). */
    def resizeBatch(payloads: Seq[Array[Byte]], w: Int, h: Int)
        : Seq[(Array[Byte], Integer, Integer)]
  }

  /** Deterministic fake resizer: truncates/cycles the payload to
    * exactly w*h bytes — stands in for a real decode→scale→encode
    * kernel; the metadata contract and batch shape are real. */
  final class StubResizer extends MediaResizer {
    def resizeBatch(payloads: Seq[Array[Byte]], w: Int, h: Int)
        : Seq[(Array[Byte], Integer, Integer)] =
      payloads.map { p =>
        if (p == null) (null, null, null)
        else {
          val out = new Array[Byte](w * h)
          if (p.nonEmpty) {
            var i = 0
            while (i < out.length) { out(i) = p(i % p.length); i += 1 }
          }
          (out, Integer.valueOf(w), Integer.valueOf(h))
        }
      }
  }

  /** Rewrite the payload column in place (same name) with resized
    * bytes, and set the width/height metadata columns to the target
    * size. Batched per partition like `extractFeatures`: one batch of
    * bytes resident per task, output payload replaces (never
    * duplicates) the input payload in the row. */
  def resize(df: DataFrame, payloadCol: String, w: Int, h: Int,
      resizer: MediaResizer, batchSize: Int = 64): DataFrame = {
    require(w > 0 && h > 0, "target dims must be positive")
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val wIdx = df.schema.fieldIndex("width")
    val hIdx = df.schema.fieldIndex("height")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val payloads = batch.map(r =>
          if (r.isNullAt(pIdx)) null else r.getAs[Array[Byte]](pIdx))
        val resized = resizer.resizeBatch(payloads, w, h)
        batch.iterator.zip(resized.iterator).map { case (r, (p2, w2, h2)) =>
          val vals = r.toSeq.toArray
          vals(pIdx) = p2
          vals(wIdx) = w2
          vals(hIdx) = h2
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
      }
    }(enc)
  }

  /** Column-expression variants for payload metadata that don't need a
    * decode kernel at all (cheaper: stays in codegen). */
  def byteLen(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    octet_length(payload)
  def contentMd5(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(payload)

  /** The reference's image-column policy (`util.py:357-368`): binary
    * columns matching a drop policy are removed before export. */
  def dropBinaryColumns(df: DataFrame, keep: Set[String] = Set.empty): DataFrame = {
    val toDrop = df.schema.fields
      .filter(f => f.dataType == BinaryType && !keep.contains(f.name))
      .map(_.name)
    if (toDrop.isEmpty) df else df.drop(toDrop: _*)
  }
}
