package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("saltedAgg produces the same totals as a direct groupBy") {
    import spark.implicits._
    // heavy skew: 90% of rows share one key
    val df = (0 until 10000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Scale.saltedAgg(df, col("k"), saltBuckets = 8,
        partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
        finals = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct)
  }

  test("saltedJoin matches a plain join on skewed data") {
    import spark.implicits._
    val fact = (0 until 5000).map(i =>
      (if (i % 5 == 0) i % 23 else 7, i.toLong)).toDF("key", "v") // key 7 is hot
    val dim = (0 until 23).map(k => (k, s"name$k")).toDF("key", "name")
    val plain = fact.join(dim, Seq("key")).agg(count(lit(1)), sum("v"))
      .collect().head
    val salted = Scale.saltedJoin(fact, dim, "key", saltBuckets = 8)
      .agg(count(lit(1)), sum("v")).collect().head
    assert(plain.getLong(0) == salted.getLong(0))
    assert(plain.getLong(1) == salted.getLong(1))
  }

  test("skewProfile surfaces the hot key first") {
    import spark.implicits._
    val df = (0 until 1000).map(i =>
      (if (i % 4 == 0) s"k$i" else "HOT", i)).toDF("k", "v")
    val top = Scale.skewProfile(df, col("k"), topN = 1).collect().head
    assert(top.getString(0) == "HOT")
    assert(top.getLong(1) == 750L)
  }

  test("bucketed join plans without a shuffle (co-located)") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (0 until 2000).map(i => (i.toLong, s"a$i")).toDF("id", "a")
      val b = (0 until 2000).map(i => (i.toLong, s"b$i")).toDF("id", "b")
      Scale.writeBucketed(a, "bucketed_a", "id", buckets = 4)
      Scale.writeBucketed(b, "bucketed_b", "id", buckets = 4)
      val joined = Scale.bucketedJoin(spark, "bucketed_a", "bucketed_b", "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 2000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
