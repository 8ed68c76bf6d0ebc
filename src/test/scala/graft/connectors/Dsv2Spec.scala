package graft.connectors

import graft.SparkSpec
import graft.connectors.dsv2.InMemoryVdbServer
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class Dsv2Spec extends SparkSpec {

  private val fmt = "graft.connectors.dsv2.InMemoryVdbProvider"
  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("vector", ArrayType(FloatType)),
    StructField("title", StringType)))

  override def beforeAll(): Unit = {
    super.beforeAll()
    InMemoryVdbServer.create("idx", schema, (0 until 2500).map(i =>
      Row(i.toString, Array.tabulate(4)(j => (i + j).toFloat), s"t$i")))
  }

  private def read = spark.read.format(fmt).option("index", "idx")
    .option("batchSize", "500").load()

  test("DSv2 scan reads all rows across offset partitions") {
    val df = read
    assert(df.count() == 2500)
    assert(df.rdd.getNumPartitions == 5) // 2500 / 500
    assert(df.select("id").distinct().count() == 2500)
  }

  test("column pruning is pushed to the service (projection in scan)") {
    val df = read.select("id", "title")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=id,title"), s"projection not pushed:\n$plan")
    assert(!plan.contains("columns=id,vector,title"))
    assert(df.collect().length == 2500)
  }

  test("limit pushdown caps the planned partitions") {
    val df = read.limit(42)
    assert(df.count() == 42)
    val scan = read.limit(42).queryExecution.executedPlan.toString
    assert(scan.contains("limit=42"), s"limit not pushed:\n$scan")
  }

  test("DSv2 write path: batched upserts, last-wins by id, task-retry safe") {
    import spark.implicits._
    InMemoryVdbServer.create("wr",
      StructType(Seq(StructField("id", StringType), StructField("v", LongType))),
      Seq.empty)
    (0 until 300).map(i => (i.toString, i.toLong)).toDF("id", "v")
      .write.format(fmt).option("index", "wr").option("batchSize", "50")
      .mode("append").save()
    assert(InMemoryVdbServer.count("wr") == 300)
    // overwrite half the ids with new values — upsert, not append
    (0 until 150).map(i => (i.toString, -1L)).toDF("id", "v")
      .write.format(fmt).option("index", "wr").mode("append").save()
    assert(InMemoryVdbServer.count("wr") == 300)
    val back = spark.read.format(fmt).option("index", "wr").load()
    assert(back.filter(col("v") === -1L).count() == 150)
    InMemoryVdbServer.drop("wr")
  }

  test("DSv2 frame composes with engine operators (join + vector fn)") {
    import spark.implicits._
    val wanted = Seq("5", "10", "2499").toDF("id")
    val joined = read.join(wanted, Seq("id"), "left_semi")
      .select(col("id"),
        graft.functions.VectorFunctions.l2Norm(col("vector")).as("n"))
    assert(joined.count() == 3)
  }
}
