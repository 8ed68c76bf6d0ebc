package graft.ops

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile computes count/null/distinct/min/max per column in one pass") {
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.5, 10L), (2.5, 10L), (null, 20L), (2.5, null))
      .toDF("x", "y")
    val out = Profiling.numericProfile(df, Seq("x", "y"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("x") == ("x", 3L, 1L, 2L, Some(1.5), Some(2.5)))
    assert(out("y") == ("y", 3L, 1L, 2L, Some(10.0), Some(20.0)))
  }

  test("approximate mode matches exact schema and is close on small data") {
    val df = (1 to 100).map(i => (i.toDouble, (i % 7).toLong)).toDF("x", "y")
    val exact = Profiling.numericProfile(df, Seq("x", "y"))
    val approx = Profiling.numericProfile(df, Seq("x", "y"), approximate = true)
    assert(approx.schema.map(_.name) == exact.schema.map(_.name))
    val nd = approx.as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r._4).toMap
    assert(math.abs(nd("x") - 100L) <= 5 && nd("y") == 7L)
  }

  test("profile of an all-null column yields null min/max") {
    val df = Seq[java.lang.Double](null, null).toDF("x")
    val out = Profiling.numericProfile(df, Seq("x"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(out == ("x", 0L, 2L, 0L, None, None))
  }
}
