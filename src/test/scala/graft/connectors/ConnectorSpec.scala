package graft.connectors

import graft.SparkSpec
import graft.core.Metric
import graft.io.VdfIO
import org.apache.spark.sql.functions._

class ConnectorSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("mockvdb").toString

  private def points(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toString, Array.tabulate(4)(j => (i * 10 + j).toFloat), s"t$i"))
      .toDF("id", "vector", "title")
  }

  test("mock VDB round trip: export → VDF dir → import → same multiset (§7.2)") {
    val src = new MockVdb(tmp())
    src.ensureIndex("idx1", 4, Metric.Cosine, createNew = false)
    src.upsert("idx1", points(0 until 200))

    // export: scan → VDF directory
    val vdfDir = tmp()
    val scanned = src.scan(spark, "idx1")
    VdfIO.writeVdf(Map(("idx1", "") -> scanned), vdfDir, exportedFrom = "mock")

    // import with id-range subset (P5) + row cap (L1)
    val dst = new MockVdb(tmp())
    dst.ensureIndex("idx1", 4, Metric.Cosine, createNew = false)
    val full = VdfIO.readVdf(spark, vdfDir)(("idx1", ""))
    val subset = full.filter(col("id").cast("long").between(50, 149)).limit(80)
    dst.upsert("idx1", subset)
    val out = dst.scan(spark, "idx1")
    assert(out.count() == 80)
    val ids = out.select("id").collect().map(_.getString(0).toLong)
    assert(ids.forall(i => i >= 50 && i <= 149))
  }

  test("mock VDB upsert is last-wins on id (J6)") {
    val db = new MockVdb(tmp())
    db.ensureIndex("i", 4, Metric.Cosine, createNew = false)
    db.upsert("i", points(0 until 10))
    import spark.implicits._
    val updated = Seq(("5", Array(9f, 9f, 9f, 9f), "NEW"))
      .toDF("id", "vector", "title")
    db.upsert("i", updated)
    val out = db.scan(spark, "i")
    assert(out.count() == 10)
    assert(out.filter(col("id") === "5").collect().head.getAs[String]("title") == "NEW")
  }

  test("createNewName suffixes from max existing (A4, vdf_import_cls.py:237-262)") {
    assert(Naming.createNewName("idx", Set()) == "idx")
    assert(Naming.createNewName("idx", Set("idx")) == "idx-2")
    assert(Naming.createNewName("idx", Set("idx", "idx-2", "idx-7")) == "idx-8")
    assert(Naming.createNewName("idx", Set("idx", "idx-x")) == "idx-2")
  }

  test("ensureIndex with createNew=true avoids collision") {
    val db = new MockVdb(tmp())
    val n1 = db.ensureIndex("idx", 4, Metric.Cosine, createNew = false)
    db.upsert(n1, points(0 until 1))
    val n2 = db.ensureIndex("idx", 4, Metric.Dot, createNew = true)
    assert(n2 == "idx-2")
    assert(db.metric(n2) == Metric.Dot)
  }

  test("batchedWithShrink: writes everything in order with a flaky sink (B3/B4)") {
    var calls = 0
    val written = scala.collection.mutable.ArrayBuffer[Int]()
    val n = UpsertPolicy.batchedWithShrink((1 to 100).iterator, batchSize = 30) {
      batch =>
        calls += 1
        if (calls == 2) throw new RuntimeException("transient")
        written ++= batch
    }
    assert(n == 100)
    assert(written.toSeq == (1 to 100))
  }

  test("batchedWithShrink: persistent failure eventually throws") {
    assertThrows[RuntimeException] {
      UpsertPolicy.batchedWithShrink((1 to 10).iterator, batchSize = 4,
        minFraction = 0.5, maxRetries = 2) { _ =>
        throw new RuntimeException("down")
      }
    }
  }

  test("rate limiter spaces calls") {
    val rl = new UpsertPolicy.RateLimiter(callsPerMinute = 6000) // 10ms interval
    val t0 = System.nanoTime()
    (1 to 5).foreach(_ => rl.acquire())
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 35) // 4 intervals of ~10ms after the first call
  }

  test("pinecone upsert rows: string ids, null metadata entries dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Some("a"), Some(10)),
      (2L, Array(3.0f, 4.0f), None, Some(20)),
      (3L, Array(5.0f, 6.0f), Some("c"), None))
      .toDF("pk", "vec", "title", "rank")
    val rows = Adapters.Pinecone.upsertRows(df, "pk", "vec",
      Seq("title", "rank")).collect().map(r =>
      (r.getString(0), r.getAs[Map[String, String]]("metadata"))).toMap
    assert(rows.keySet == Set("1", "2", "3"))
    assert(rows("1") == Map("title" -> "a", "rank" -> "10"))
    assert(rows("2") == Map("rank" -> "20")) // null title vanished
    assert(rows("3") == Map("title" -> "c"))
  }

  test("chroma upsert rows: null-vector drop, scalar-only metadata, docs") {
    import spark.implicits._
    import graft.core.{ModelMap, NamespaceMeta}
    val df = Seq(
      (1L, Option(Array(1.0f)), "body one", Array(1, 2), 0.5),
      (2L, None, "body two", Array(3), 0.6),
      (3L, Option(Array(2.0f)), "body three", Array.empty[Int], 0.7))
      .toDF("pk", "vec", "body", "tags", "score")
    val ns = NamespaceMeta(model_map = Some(Map(
      "vec" -> ModelMap(text_column = Some("body")))))
    val out = Adapters.Chroma.upsertRows(df, "pk", "vec", ns)
    // null-vector row 2 dropped; array column excluded from metadata
    assert(out.columns.toSeq ==
      Seq("id", "embedding", "document", "body", "score"))
    val got = out.select("id", "document").as[(String, String)].collect().toMap
    assert(got == Map("1" -> "body one", "3" -> "body three"))
    // no text column recorded → ids become the documents
    val noMap = Adapters.Chroma.upsertRows(df, "pk", "vec", NamespaceMeta())
    assert(noMap.select("document").as[String].collect().toSet == Set("1", "3"))
  }

  test("vertexai datapoint rows: restricts accumulate, numeric typed, crowding") {
    import spark.implicits._
    val df = Seq((7L, Array(1.0f, 2.0f), "news", "spam", 42, "groupA"))
      .toDF("pk", "vec", "topic", "flag", "rank", "grp")
    val out = Adapters.VertexAi.datapointRows(df, "pk", "vec",
      restricts = Seq(
        Adapters.VertexRestrict("topics", allowCols = Seq("topic")),
        Adapters.VertexRestrict("flags", denyCols = Seq("flag"))),
      numeric = Seq(Adapters.VertexNumericRestrict("rank", "value_int")),
      crowdingTagCol = Some("grp"))
    val r = out.collect().head
    assert(r.getAs[String]("datapoint_id") == "7")
    val restricts = r.getSeq[org.apache.spark.sql.Row](2)
    // vertexai…import.py:920-945 shares one allow/deny list per row
    // across entries, so entry 2 carries entry 1's allow token too
    assert(restricts.map(_.getAs[String]("namespace")) ==
      Seq("topics", "flags"))
    assert(restricts(0).getSeq[String](1) == Seq("news"))
    assert(restricts(1).getSeq[String](1) == Seq("news")) // cumulative
    assert(restricts(1).getSeq[String](2) == Seq("spam"))
    val nr = r.getSeq[org.apache.spark.sql.Row](3).head
    assert(nr.getAs[String]("data_type") == "value_int" &&
      nr.getAs[Double]("value") == 42.0)
    assert(r.getAs[String]("crowding_tag") == "groupA")
    // no configs → empty typed arrays, null crowding tag
    val bare = Adapters.VertexAi.datapointRows(df, "pk", "vec").collect().head
    assert(bare.getSeq[org.apache.spark.sql.Row](2).isEmpty &&
      bare.getSeq[org.apache.spark.sql.Row](3).isEmpty &&
      bare.isNullAt(4))
  }
}
