package graft.streaming

import graft.SparkSpec
import graft.similarity.Ivf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming IVF ingest: stream-assigned vectors land in the same
  * list-partitioned layout as the batch build, incrementally. */
class IvfIngestSpec extends SparkSpec {

  // three separated clusters in 8-d (the IvfSpec fixture shape)
  private def vec(i: Long): Array[Float] = {
    val c = (i % 3).toInt
    Array.tabulate(8)(j =>
      (if (j == c * 2) 10f else 0f) + (math.sin(i * 8 + j) * 0.3).toFloat)
  }

  test("ivfIngest appends stream batches into the writeIndex layout, bit-equal to batch assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = (0L until 30L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val centroids = Ivf.build(train, "vec_id", "embedding", nlist = 3).centroids

    val dir = java.nio.file.Files.createTempDirectory("ivf_ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivf_ingest_ckpt").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.ivfIngest(
      input.toDF().toDF("vec_id", "embedding"),
      centroids, "vec_id", "embedding", dir, ckpt)
    try {
      input.addData((30L until 45L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(dir)
      assert(afterB1.count() == 15)
      val filesB1 = new java.io.File(dir).listFiles().flatMap(d =>
        Option(d.listFiles()).getOrElse(Array.empty)).map(_.getPath).toSet

      input.addData((45L until 60L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      val streamed = spark.read.parquet(dir)
      assert(streamed.count() == 30)
      // incremental: batch-1 files still present, untouched by batch 2
      val filesB2 = new java.io.File(dir).listFiles().flatMap(d =>
        Option(d.listFiles()).getOrElse(Array.empty)).map(_.getPath).toSet
      assert(filesB1.subsetOf(filesB2), "batch-1 files were rewritten")

      // stream assignment ≡ batch assignment (identical expression)
      val batch = Ivf.assignTo(
        (30L until 60L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
        centroids, "vec_id", "embedding")
      val got = streamed.select("vec_id", "list_id").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = batch.select("vec_id", "list_id").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want)

      // the streamed index serves the same partition-pruned search as
      // an in-memory index over the same rows
      val reopened = Ivf.readIndex(spark, dir, centroids, "vec_id", "embedding")
      val mem = Ivf.IvfIndex(centroids, batch, "vec_id", "embedding")
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
      assert(key(Ivf.searchVector(reopened, vec(31L), k = 4, nprobe = 1)) ==
        key(Ivf.searchVector(mem, vec(31L), k = 4, nprobe = 1)))
    } finally q.stop()
  }
}
