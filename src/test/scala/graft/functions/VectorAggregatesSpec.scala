package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorAggregatesSpec extends SparkSpec {

  test("elementwiseStats matches the posexplode formulation") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1f, -2f, 3f)), (0, Seq(4f, 0f, -1f)),
      (1, Seq(10f, 10f, 10f)), (0, Seq(0f, 5f, 0f)))
      .toDF("label", "vec")
    val agg = df.groupBy("label")
      .agg(VectorAggregates.elementwiseStats(col("vec")).as("st"))
      .select(col("label"), posexplode(expr("arrays_zip(st.min, st.max, st.sum)"))
        .as(Seq("dim", "z")))
      .select(col("label"), col("dim"), col("z.min").as("mn"),
        col("z.max").as("mx"), col("z.sum").as("sm"))
    val exploded = df.select(col("label"), posexplode(col("vec")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"),
        sum(col("v").cast("double")).as("sm"))
    val a = agg.collect().map(r => (r.getInt(0), r.getInt(1)) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val b = exploded.collect().map(r => (r.getInt(0), r.getInt(1)) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(a == b)
  }

  test("q_vec_stats plan: explode stays map-side (partial agg before the one exchange)") {
    // round 6 moved q_vec_stats from the typed Aggregator to
    // posexplode + (label, dim) hash aggregate: the d× explode must be
    // collapsed by a partial_min/max/sum HashAggregate BELOW the first
    // Exchange (shuffle volume = groups × d per partition, the same
    // bound the Aggregator's array buffer gave), and the aggregate
    // must be codegen'd HashAggregate, not ObjectHashAggregate
    val df = graft.SparkEntry.queries("q_vec_stats")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ObjectHashAggregate"),
      s"q_vec_stats regressed to a non-codegen object aggregate:\n$p")
    val gen = p.indexOf("Generate")
    val partial = p.indexOf("partial_min")
    val exchange = p.indexOf("Exchange hashpartitioning")
    assert(gen >= 0 && partial >= 0 && exchange >= 0, p)
    // plan text prints top-down: Generate is the deepest (largest idx),
    // the partial agg sits between the explode and the exchange
    assert(exchange < partial && partial < gen,
      s"partial aggregate is not between the exchange and the explode:\n$p")
  }

  test("null and empty vectors are skipped; ragged input fails fast") {
    import spark.implicits._
    val df = Seq((0, Seq(1f, 2f)), (0, null), (0, Seq.empty[Float]))
      .toDF("label", "vec")
    val st = df.groupBy("label")
      .agg(VectorAggregates.elementwiseStats(col("vec")).as("st"))
      .select("st.n").as[Long].head()
    assert(st == 1L)
    val ragged = Seq((0, Seq(1f, 2f)), (0, Seq(1f, 2f, 3f))).toDF("label", "vec")
    val e = intercept[Exception] {
      ragged.groupBy("label")
        .agg(VectorAggregates.elementwiseStats(col("vec")).as("st"))
        .collect()
    }
    assert(e.getMessage != null)
  }
}
