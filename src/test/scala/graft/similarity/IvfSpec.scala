package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  // three well-separated clusters in 8-d
  private lazy val vecs = {
    import spark.implicits._
    (0L until 90L).map { i =>
      val c = (i % 3).toInt
      val base = Array.tabulate(8)(j => if (j == c * 2) 10f else 0f)
      (i, base.zipWithIndex.map { case (x, j) =>
        x + (math.sin(i * 8 + j) * 0.3).toFloat })
    }.toDF("vec_id", "embedding")
  }

  private lazy val index = Ivf.build(vecs, "vec_id", "embedding", nlist = 3)

  test("build assigns every vector; clusters are coherent") {
    assert(index.assigned.count() == 90)
    assert(index.centroids.size == 3)
    // each list holds exactly one synthetic cluster (30 vectors)
    val sizes = index.assigned.groupBy("list_id").count()
      .collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(30L, 30L, 30L))
  }

  test("search with nprobe=nlist equals brute force top-k") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val ivf = Ivf.search(index, q, k = 4, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Knn.bruteForceTopK(q, vecs, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == brute)
  }

  test("at-rest layout: partitionBy(list_id) prunes unprobed lists at scan") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_layout").toString
    index.assigned.write.partitionBy("list_id").mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val probed = onDisk.filter(col("list_id") === 1)
    // the probe filter must become a partition filter (no data read
    // from other lists), not a post-scan predicate
    val scanOpt = probed.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scanOpt.nonEmpty,
      s"no V1 parquet scan found in:\n${probed.queryExecution.executedPlan}")
    assert(scanOpt.get.partitionFilters.nonEmpty,
      probed.queryExecution.executedPlan.toString)
    assert(probed.count() == 30)
    // every stored row keeps its vector + id next to its codes/list
    assert(onDisk.columns.toSet == index.assigned.columns.toSet)
  }

  test("writeIndex → readIndex → searchVector: static probe prunes partitions, matches in-memory result") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Ivf.writeIndex(index, dir)
    val reopened = Ivf.readIndex(spark, dir, index.centroids, "vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val onDisk = Ivf.searchVector(reopened, q, k = 5, nprobe = 1)
    // the nprobe list choice became a PARTITION filter on the scan
    val scan = onDisk.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty && scan.get.partitionFilters.nonEmpty,
      onDisk.queryExecution.executedPlan.toString)
    // and the result is identical to probing the in-memory assignment
    val mem = Ivf.searchVector(index, q, k = 5, nprobe = 1)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(key(onDisk) == key(mem))
    // all 5 neighbors come from the probed (own) cluster: ids ≡ 0 mod 3
    assert(onDisk.collect().forall(_.getLong(0) % 3 == 0))
  }

  test("search with nprobe=1 stays inside the query's own cluster") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") === 0) // cluster 0
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val hits = Ivf.search(index, q, k = 5, nprobe = 1)
      .collect().map(_.getLong(1))
    assert(hits.length == 5)
    assert(hits.forall(_ % 3 == 0), s"left the cluster: ${hits.mkString(",")}")
  }

  test("searchWhere PRE-filters: top-k fills from qualifying vectors only") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // predicate: ids ≡ 0 mod 6 — half of the query's own cluster
    val hits = Ivf.searchWhere(index, q, k = 5, nprobe = 1,
        col("vec_id") % 6 === 0)
      .collect().map(_.getLong(1))
    assert(hits.length == 5, s"under-filled: ${hits.mkString(",")}")
    assert(hits.forall(h => h % 6 == 0 && h != 0L),
      s"non-qualifying hit: ${hits.mkString(",")}")
    // post-filtering the unfiltered top-k would NOT yield 5 rows here
    val post = Ivf.search(index, q, k = 5, nprobe = 1)
      .filter(col("vec_id") % 6 === 0).count()
    assert(post < 5, s"test not discriminating: post-filter kept $post")
  }

  test("searchWhere on the at-rest layout: predicate is pushed to the probed-list scan") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_filtered").toString
    Ivf.writeIndex(index, dir)
    val reopened = Ivf.readIndex(spark, dir, index.centroids, "vec_id", "embedding")
    import spark.implicits._
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val res = Ivf.searchWhere(reopened, q, k = 3, nprobe = 1,
      col("vec_id") >= 30)
    assert(res.collect().forall(_.getLong(1) >= 30))
    // the metadata predicate reaches the parquet scan as a PUSHED
    // filter, riding next to the list partition pruning (execute
    // first: under AQE the final plan exists only after the run;
    // string-match like PlanSpec since stages nest the scan)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*vec_id[^\\]]*\\].*"),
      plan)
  }
}
