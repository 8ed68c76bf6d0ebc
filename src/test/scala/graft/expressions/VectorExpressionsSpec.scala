package graft.expressions

import graft.SparkSpec
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.cast("double").as("r")).collect().head.getDouble(0)
  }

  private val a = array(lit(1.0f), lit(2.0f), lit(2.0f))
  private val b = array(lit(3.0f), lit(4.0f), lit(0.0f))

  test("native dot/l2sq/l1 match values") {
    assert(one(GraftExtensions.dot(a, b)) === 11.0)
    assert(one(GraftExtensions.l2Sq(a, b)) === 12.0)
    assert(one(GraftExtensions.l1(a, b)) === 6.0)
    assert(math.abs(one(GraftExtensions.cosine(a, a)) - 1.0) < 1e-12)
  }

  test("native expressions agree bit-for-bit with the HOF formulation") {
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong,
        Array.tabulate(64)(j => (math.sin(i * 64 + j) * 3).toFloat),
        Array.tabulate(64)(j => (math.cos(i * 64 + j) * 2).toFloat))
    }.toDF("id", "va", "vb")
    val diff = vecs.select(
        (GraftExtensions.dot(col("va"), col("vb")) -
         VF.dotProduct(col("va"), col("vb"))).as("d"))
      .agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(diff == 0.0, s"native vs HOF dot differ by $diff")
    val diffCos = vecs.select(
        (GraftExtensions.cosine(col("va"), col("vb")) -
         VF.cosineSimilarity(col("va"), col("vb"))).as("d"))
      .agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(diffCos == 0.0)
  }

  test("null elements, length mismatch, and null arrays all yield null (HOF semantics)") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](2.0f, 5.0f, 2.0f)),
      (Array[java.lang.Float](1.0f), Array[java.lang.Float](1.0f, 2.0f)),
      (null, Array[java.lang.Float](1.0f))
    ).toDF("x", "y")
    val rows = df.select(GraftExtensions.dot(col("x"), col("y")).as("d")).collect()
    assert(rows.forall(_.isNullAt(0)),
      "null poisons the fold, exactly like aggregate(zip_with(...)) and the oracle")
  }

  test("SQL registration via GraftExtensions.register") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b")
      .createOrReplaceTempView("vexpr")
    val r = spark.sql(
      """SELECT graft_dot(a, b) AS d, graft_cosine(a, b) AS c,
        |       graft_l2sq(a, b) AS l2, graft_l1(a, b) AS l1 FROM vexpr""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("codegen path is exercised (no interpreted fallback errors at scale)") {
    import spark.implicits._
    val n = 5000
    val vecs = (0 until n).map(i =>
      (i.toLong, Array.tabulate(32)(j => ((i + j) % 7).toFloat))).toDF("id", "v")
    // self-similarity must be 1 for nonzero vectors across a full scan
    val bad = vecs.filter(size(col("v")) > 0)
      .select(GraftExtensions.cosine(col("v"), col("v")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-9).count()
    assert(bad == 0)
  }
}
