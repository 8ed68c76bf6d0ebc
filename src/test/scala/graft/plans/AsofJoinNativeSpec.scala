package graft.plans

import graft.SparkSpec
import graft.ops.AsofJoin
import org.apache.spark.sql.functions.col

class AsofJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq((1L, "k1", 10L), (2L, "k1", 20L), (3L, "k1", 5L),
    (4L, "k2", 100L), (5L, "kX", 7L), (6L, "k1", 15L)).toDF("id", "k", "t")
  private lazy val right = Seq(("k1", 10L, "a"), ("k1", 15L, "b"), ("k2", 99L, "c"))
    .toDF("rk", "rt", "payload")

  test("native asof matches the union-merge formulation, both modes") {
    for (incl <- Seq(true, false)) {
      val expected = AsofJoin.asofBackward(left, right, "k", "rk", "t", "rt", incl)
        .collect().map(_.toSeq).toSet
      val got = AsofJoinNative.asof(left, right, "k", "rk", "t", "rt", incl)
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"inclusive=$incl")
    }
  }

  test("native asof output schema: left columns then right time + payload") {
    val out = AsofJoinNative.asof(left, right, "k", "rk", "t", "rt")
    assert(out.columns.toSeq == Seq("id", "k", "t", "rt", "payload"))
    assert(out.schema("rt").nullable && out.schema("payload").nullable)
  }

  test("native asof composes with downstream operators") {
    val out = AsofJoinNative.asof(left, right, "k", "rk", "t", "rt")
      .groupBy("k").count().orderBy("k")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("k1", 4L), ("k2", 1L), ("kX", 1L)))
  }

  test("native asof plans AsofJoinExec with co-partitioned exchanges") {
    val plan = AsofJoinNative.asof(left, right, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
  }

  test("native asof handles shared lineage (self as-of / previous row)") {
    val df = Seq((1L, "k1", 10L, "a"), (2L, "k1", 20L, "b"), (3L, "k2", 5L, "c"))
      .toDF("id", "k", "t", "payload")
    val r = df.select(col("k").as("rk2"), col("t").as("t2"),
      col("payload").as("prev"))
    val out = AsofJoinNative.asof(df, r, "k", "rk2", "t", "t2",
        inclusive = false)
      .select("id", "prev").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> None, 2L -> Some("a"), 3L -> None))
  }

  test("native asof resolves columns case-insensitively") {
    val out = AsofJoinNative.asof(left, right, "K", "RK", "T", "RT")
    assert(out.count() == left.count())
  }

  test("native asof matches on a larger keyed series (events x orders shape)") {
    val n = 5000
    val l = spark.range(n).selectExpr("id", "cast(id % 50 as long) AS k",
      "cast((id * 37) % 1000 as long) AS t")
    val r = spark.range(500).selectExpr("cast(id % 50 as long) AS rk",
      "cast((id * 13) % 997 as long) AS rt", "id AS val")
      .dropDuplicates("rk", "rt")
    val expected = AsofJoin.asofBackward(l, r, "k", "rk", "t", "rt")
      .collect().map(_.toSeq).toSet
    val got = AsofJoinNative.asof(l, r, "k", "rk", "t", "rt")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("count-only plans eliminate the as-of join (cardinality-preserving)") {
    for (asof <- Seq(
        AsofJoinNative.asof(left, right, "k", "rk", "t", "rt"),
        AsofJoinNative.asofBroadcast(left, right, "k", "rk", "t", "rt"))) {
      val cnt = asof.groupBy().count()
      val plan = cnt.queryExecution.optimizedPlan.toString
      assert(!plan.contains("AsofJoin"), plan)
      assert(cnt.as[Long].head() == left.count())
    }
  }

  test("projections consuming right columns keep the join") {
    val df = AsofJoinNative.asof(left, right, "k", "rk", "t", "rt")
      .select("id", "payload")
    assert(df.queryExecution.optimizedPlan.toString.contains("AsofJoin"))
    // and left-only projections drop it while preserving multiplicity
    val leftOnly = AsofJoinNative.asof(left, right, "k", "rk", "t", "rt")
      .select("id", "k")
    assert(!leftOnly.queryExecution.optimizedPlan.toString.contains("AsofJoin"))
    assert(leftOnly.count() == left.count())
  }

  test("a right side pre-partitioned on the key reuses its exchange") {
    def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange (hash|range)partitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    val plain = AsofJoinNative.asof(left, right, "k", "rk", "t", "rt")
    val prePart = AsofJoinNative.asof(left,
      right.repartition(col("rk")), "k", "rk", "t", "rt")
    // plain: one planner-inserted exchange per side; pre-partitioned:
    // the user repartition IS the right side's clustering, so
    // EnsureRequirements inserts nothing for it
    assert(nExchanges(plain) == 2,
      plain.queryExecution.executedPlan.toString)
    assert(nExchanges(prePart) == 2,
      prePart.queryExecution.executedPlan.toString)
    val expected = AsofJoin.asofBackward(left, right, "k", "rk", "t", "rt")
      .collect().map(_.toSeq).toSet
    assert(prePart.collect().map(_.toSeq).toSet == expected)
  }
}
