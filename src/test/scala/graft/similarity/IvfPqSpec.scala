package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {

  // four well-separated clusters in 16-d
  private lazy val vecs = {
    import spark.implicits._
    (0L until 120L).map { i =>
      val c = (i % 4).toInt
      val base = Array.tabulate(16)(j => if (j / 4 == c) 6f else 0f)
      (i, base.zipWithIndex.map { case (x, j) =>
        x + (math.sin(i * 16 + j) * 0.3).toFloat })
    }.toDF("vec_id", "embedding")
  }

  private lazy val index = IvfPq.build(vecs, "vec_id", "embedding",
    dim = 16, nlist = 4, m = 4, ksub = 8)

  test("build assigns a list and codes to every vector") {
    assert(index.encoded.count() == 120)
    val row = index.encoded.select("list_id", "codes").head()
    assert(row.getInt(0) >= 0 && row.getInt(0) < 4)
    assert(row.getSeq[Int](1).length == 4)
  }

  test("search with nprobe=nlist matches full-PQ search") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val ivfpq = IvfPq.search(index, q, k = 5, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqIndex = Pq.PqIndex(index.codebooks, index.dsub,
      index.encoded, "vec_id", "embedding")
    val full = Pq.search(pqIndex, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq == full)
  }

  test("writeIndex → readIndex → search: codes-only layout, partition-pruned, same results") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    IvfPq.writeIndex(index, dir)
    val reopened = IvfPq.readIndex(spark, dir, index.centroids,
      index.codebooks, index.dsub, "vec_id", "embedding")
    // the raw vector column is NOT stored — codes are the index payload
    assert(reopened.encoded.columns.toSet == Set("vec_id", "codes", "list_id"))
    val q = vecs.filter(col("vec_id") === 1)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val onDisk = IvfPq.search(reopened, q, k = 5, nprobe = 1)
    // the at-rest layout is one directory per coarse list (what a
    // probe's list_id filter prunes; pruning mechanics are asserted on
    // the static-filter path in IvfSpec)
    val listDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list_id="))
    assert(listDirs.length == 4, listDirs.mkString(","))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(key(onDisk) == key(IvfPq.search(index, q, k = 5, nprobe = 1)))
  }

  test("search with nprobe=1 stays inside the query's cluster") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") === 1) // cluster 1
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val hits = IvfPq.search(index, q, k = 5, nprobe = 1).collect()
      .map(_.getLong(1))
    assert(hits.length == 5)
    assert(hits.forall(_ % 4 == 1), s"left the cluster: ${hits.mkString(",")}")
  }
}
