package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 15L), (4L, 99L), (5L, -3L)
  ).toDF("pid", "x")
  private lazy val intervals = Seq(
    (100L, 0L, 10L), (200L, 8L, 20L), (300L, -10L, -1L), (400L, 50L, 60L)
  ).toDF("iid", "lo", "hi")

  private def join(w: Long): Set[(Long, Long)] =
    RangeJoin.intervalJoin(points, "x", intervals, "lo", "hi", w)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  private val expected = Set(
    (1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L), (5L, 300L))

  test("containment join matches the nested-loop semantics") {
    assert(join(8L) == expected)
  }

  test("bucket width does not change the result (incl. width 1 and huge)") {
    for (w <- Seq(1L, 3L, 64L, 1000L)) assert(join(w) == expected, s"w=$w")
  }

  test("each qualifying pair appears exactly once") {
    val rows = RangeJoin.intervalJoin(points, "x", intervals, "lo", "hi", 4L)
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(rows.length == rows.toSet.size)
    assert(rows.toSet == expected)
  }

  test("bandJoin pairs values within eps, either direction") {
    val l = Seq((1L, 10L), (2L, 50L), (3L, 98L)).toDF("lid", "x")
    val r = Seq((7L, 12L), (8L, 100L), (9L, 200L)).toDF("rid", "y")
    val out = RangeJoin.bandJoin(l, "x", r, "y", eps = 3L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 7L), (3L, 8L)))
    // eps=0 degenerates to equality
    val eq = RangeJoin.bandJoin(l, "x", r.withColumn("y", lit(10L)), "y", 0L)
      .select("lid").as[Long].collect().toSet
    assert(eq == Set(1L))
  }

  test("epoch-nanos magnitudes (> 2^53) bucket exactly") {
    // double division would round the quotient here and drop the pair
    val base = 1700000000000000000L // ~2026 in epoch nanos
    val pts = Seq((1L, base + 123L), (2L, base + 5_000_000_000L)).toDF("pid", "x")
    val ivs = Seq((10L, base, base + 1_000_000_000L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.intervalJoin(pts, "x", ivs, "lo", "hi",
        bucketWidth = 1_000_000_000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("null and inverted intervals are dropped; no nested-loop in plan") {
    val iv2 = Seq((1L, Option(5L), Option(1L)), (2L, Option.empty[Long], Option(9L)))
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.intervalJoin(points, "x", iv2, "lo", "hi", 4L)
    assert(out.count() == 0)
    val plan = RangeJoin.intervalJoin(points, "x", intervals, "lo", "hi", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
