package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  // four well-separated clusters in 16-d
  private lazy val vecs = {
    import spark.implicits._
    (0L until 80L).map { i =>
      val c = (i % 4).toInt
      val base = Array.tabulate(16)(j => if (j / 4 == c) 5f else 0f)
      (i, base.zipWithIndex.map { case (x, j) =>
        x + (math.sin(i * 16 + j) * 0.25).toFloat })
    }.toDF("vec_id", "embedding")
  }

  private lazy val index =
    Pq.build(vecs, "vec_id", "embedding", dim = 16, m = 4, ksub = 4)

  test("build encodes every vector with m codes in [0, ksub)") {
    val codes = index.encoded.select(col("codes")).collect()
      .map(_.getSeq[Int](0))
    assert(codes.length == 80)
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 4)))
  }

  test("encoding is deterministic across invocations") {
    val a = Pq.build(vecs, "vec_id", "embedding", 16, 4, 4)
      .encoded.select("vec_id", "codes").collect().map(_.toSeq).toSet
    val b = Pq.build(vecs, "vec_id", "embedding", 16, 4, 4)
      .encoded.select("vec_id", "codes").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("ADC search recall vs exact-L2 brute force is high") {
    import graft.expressions.GraftExtensions
    val fine = Pq.build(vecs, "vec_id", "embedding", dim = 16, m = 4, ksub = 8)
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val pq = Pq.search(fine, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // exact ground truth under the SAME metric PQ approximates (sq. L2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d2").asc, col("vec_id"))
    val brute = q.crossJoin(vecs)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("d2", GraftExtensions.l2Sq(col("q_vec"), col("embedding")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (qid, truth) =>
      pq.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall $mean; per-query $recalls")
  }

  test("rows with null or mis-sized vectors never reach the top-k") {
    import spark.implicits._
    val dirty = vecs.unionByName(Seq(
      (900L, null.asInstanceOf[Array[Float]]),
      (901L, Array(1f, 2f)) // wrong dimensionality
    ).toDF("vec_id", "embedding"))
    val idx = Pq.build(dirty, "vec_id", "embedding", 16, 4, 4)
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val hits = Pq.search(idx, q, k = 10).collect().map(_.getLong(1)).toSet
    // null adc sorts NULLS FIRST under plain asc — these must be filtered
    assert(!hits.contains(900L) && !hits.contains(901L), hits.toString)
    assert(hits.size == 10)
  }

  test("ADC neighbors stay inside the query's cluster") {
    import spark.implicits._
    val q = vecs.filter(col("vec_id") === 0) // cluster 0
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val hits = Pq.search(index, q, k = 5).collect().map(_.getLong(1))
    assert(hits.length == 5)
    assert(hits.forall(_ % 4 == 0), s"left the cluster: ${hits.mkString(",")}")
  }
}
