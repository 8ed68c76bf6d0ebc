package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SessionsAsofSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits on gap, 0-based per key, deterministic ties") {
    val e = Seq(
      ("u1", 0L, 1L), ("u1", 50L, 2L), ("u1", 200L, 3L), ("u1", 260L, 4L),
      ("u2", 5L, 5L), ("u2", 5L, 6L) // tie broken by id
    ).toDF("k", "t", "id")
    val out = Sessions.sessionize(e, "k", "t", gap = 100L, tieBreak = Seq("id"))
      .select("k", "id", "session_id").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("u1", 1L, 0L), ("u1", 2L, 0L), ("u1", 3L, 1L),
      ("u1", 4L, 1L), ("u2", 5L, 0L), ("u2", 6L, 0L)))
  }

  test("sessionStats aggregates bounds per session") {
    val e = Seq(("u1", 0L, 1L), ("u1", 10L, 2L), ("u1", 500L, 3L))
      .toDF("k", "t", "id")
    val out = Sessions.sessionStats(e, "k", "t", gap = 100L, tieBreak = Seq("id"))
      .select("k", "session_id", "n_events", "start_ts", "end_ts")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(("u1", 0L, 2L, 0L, 10L), ("u1", 1L, 1L, 500L, 500L)))
  }

  private val left = Seq((1L, "k1", 10L), (2L, "k1", 20L), (3L, "k1", 5L),
    (4L, "k2", 100L), (5L, "kX", 7L)).toDF("id", "k", "t")
  private val right = Seq(("k1", 10L, "a"), ("k1", 15L, "b"), ("k2", 99L, "c"))
    .toDF("rk", "rt", "payload")

  test("asof backward inclusive matches latest right at or before left time") {
    val out = AsofJoin.asofBackward(left, right, "k", "rk", "t", "rt")
      .select("id", "rt", "payload").as[(Long, Option[Long], Option[String])]
      .collect().toSet
    assert(out == Set(
      (1L, Some(10L), Some("a")), // equal time matches when inclusive
      (2L, Some(15L), Some("b")),
      (3L, None, None),           // nothing at or before t=5
      (4L, Some(99L), Some("c")),
      (5L, None, None)))          // key absent on right
  }

  test("asof backward strict excludes equal-time right rows") {
    val out = AsofJoin.asofBackward(left, right, "k", "rk", "t", "rt",
        inclusive = false)
      .select("id", "payload").as[(Long, Option[String])].collect().toSet
    assert(out.contains((1L, None)) && out.contains((2L, Some("b"))))
  }

  test("broadcast asof agrees with union-merge asof on both modes") {
    for (incl <- Seq(true, false)) {
      val a = AsofJoin.asofBackward(left, right, "k", "rk", "t", "rt", incl)
        .collect().map(_.toSeq).toSet
      val b = AsofJoin.asofBackwardBroadcast(left, right, "k", "rk", "t", "rt", incl)
        .collect().map(_.toSeq).toSet
      assert(a == b, s"inclusive=$incl")
    }
  }

  test("broadcast asof plans with no shuffle and no sort anywhere") {
    val exec = AsofJoin.asofBackwardBroadcast(left, right, "k", "rk", "t", "rt")
      .queryExecution.executedPlan
    val shuffles = exec.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s }
    val sorts = exec.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(shuffles.isEmpty && sorts.isEmpty, exec.toString)
    // the only exchange is the dimension-side broadcast
    assert(exec.toString.contains("BroadcastExchange"), exec.toString)
  }

  test("two broadcast asofs on the SAME right side with different time cols stay distinct") {
    // ReuseExchange can hand one broadcast to both operators; the
    // per-executor index cache must not serve operator A's index
    // (keyed on rt1) to operator B (keyed on rt2).
    val r2 = Seq(("k1", 10L, 100L, "x"), ("k1", 90L, 5L, "y"))
      .toDF("rk", "rt1", "rt2", "payload")
    val viaRt1 = AsofJoin.asofBackwardBroadcast(left, r2, "k", "rk", "t", "rt1")
    val viaRt2 = AsofJoin.asofBackwardBroadcast(left, r2, "k", "rk", "t", "rt2")
    val both = viaRt1.select($"id", $"payload".as("p1"))
      .join(viaRt2.select($"id", $"payload".as("p2")), "id")
    val m = both.collect().map(r => r.getLong(0) ->
      (Option(r.getString(1)), Option(r.getString(2)))).toMap
    // id=2 (k1, t=20): rt1<=20 only row rt1=10 ("x"); rt2<=20 only rt2=5 ("y")
    assert(m(2L) == (Some("x"), Some("y")), m.toString)
    // id=3 (k1, t=5): no rt1<=5; rt2=5 matches ("y")
    assert(m(3L) == (None, Some("y")), m.toString)
  }

  test("all asof implementations skip right rows with null key or time") {
    val r2 = Seq(("k1", Option(5L), "a"), ("k1", Option.empty[Long], "nulltime"),
      (null.asInstanceOf[String], Option(3L), "nullkey"))
      .toDF("rk", "rt", "payload")
    val expected = Set[(Long, Option[String])](
      (1L, Some("a")), (2L, Some("a")), (3L, Some("a")), (4L, None), (5L, None))
    val a = AsofJoin.asofBackward(left, r2, "k", "rk", "t", "rt")
      .select("id", "payload").as[(Long, Option[String])].collect().toSet
    val b = AsofJoin.asofBackwardBroadcast(left, r2, "k", "rk", "t", "rt")
      .select("id", "payload").as[(Long, Option[String])].collect().toSet
    val c = graft.plans.AsofJoinNative.asof(left, r2, "k", "rk", "t", "rt")
      .select("id", "payload").as[(Long, Option[String])].collect().toSet
    assert(a == expected && b == expected && c == expected, s"$a $b $c")
  }

  test("asof output keeps every left row and column") {
    val out = AsofJoin.asofBackward(left, right, "k", "rk", "t", "rt")
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("id", "k", "t", "rt", "payload"))
  }
}
