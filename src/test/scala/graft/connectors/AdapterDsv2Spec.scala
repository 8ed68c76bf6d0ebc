package graft.connectors

import graft.SparkSpec
import graft.connectors.dsv2.{AdapterVdb, InMemoryVdbServer}
import graft.core.{ModelMap, NamespaceMeta}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-trips each per-DB semantics adapter through the DSv2
  * connector (VERDICT r4 ask #6): export frame → adapter-translated
  * DDL + row shaping → batched DSv2 upsert → DSv2 scan read-back. The
  * assertions check the TRANSLATED structs at the write boundary
  * (`InMemoryVdbServer.specOf`) — i.e. what a real client would have
  * forwarded to the service — plus the shaped rows and the scan
  * pushdown on the way back out. */
class AdapterDsv2Spec extends SparkSpec {

  import Adapters._

  private def ns(dims: Int = 4, metric: Option[String] = Some("Cosine"),
      namespace: String = "", vectorColumns: List[String] = List("vector"),
      modelMap: Option[Map[String, ModelMap]] = None): NamespaceMeta =
    NamespaceMeta(namespace = namespace, dimensions = dims, metric = metric,
      vector_columns = vectorColumns, model_map = modelMap)

  private def srcDf(n: Int = 20): DataFrame = {
    import spark.implicits._
    (0 until n).map(i =>
      (i.toLong, Array.tabulate(4)(j => (i + j).toFloat),
        s"title $i", if (i % 3 == 0) null else s"cat${i % 2}", i * 1.5))
      .toDF("id", "vector", "title", "category", "score")
  }

  test("qdrant: collection spec at the boundary + verbatim round-trip") {
    val c = AdapterVdb.qdrantImport(srcDf(), "idx-q",
      ns(namespace = "prod"), batchSize = 7)
    assert(c == "idx-q_prod")
    val spec = InMemoryVdbServer.specOf(c).get.asInstanceOf[QdrantCollectionSpec]
    assert(spec.vectorsConfig == Map("vector" ->
      QdrantVectorParams(4, "Cosine", None)))
    val back = AdapterVdb.read(spark, c)
    assert(back.count() == 20)
    // pruned read reaches the service
    val plan = back.select("id", "title").queryExecution.executedPlan.toString
    assert(plan.contains("columns=id,title"))
    InMemoryVdbServer.drop(c)
  }

  test("milvus: compliant renames + AUTOINDEX reverse metric at the boundary") {
    val df = srcDf().withColumnRenamed("vector", "embed-col")
    val c = AdapterVdb.milvusImport(df, "my-idx",
      ns(metric = Some("Euclid"), vectorColumns = List("embed-col")))
    assert(c == "my_idx")
    val (coll, idx) = InMemoryVdbServer.specOf(c).get
      .asInstanceOf[(MilvusCollectionSpec, MilvusIndexSpec)]
    assert(coll.vectorField == "embed_col" && coll.enableDynamicField)
    assert(idx == MilvusIndexSpec("L2", "AUTOINDEX"))
    // the stored schema carries the compliant names
    assert(InMemoryVdbServer.schemaOf(c).fieldNames.contains("embed_col"))
    assert(AdapterVdb.read(spark, c).count() == 20)
    InMemoryVdbServer.drop(c)
  }

  test("pinecone: name compliance, placement, null-metadata drop") {
    val c = AdapterVdb.pineconeImport(srcDf(), "My_Index",
      ns(namespace = "nsA"), serverless = true)
    assert(c == "my-index/nsA")
    val spec = InMemoryVdbServer.specOf(c).get.asInstanceOf[PineconeIndexSpec]
    assert(spec.name == "my-index" &&
      spec.placement == PineconeServerless("aws", "us-west-2"))
    val back = AdapterVdb.read(spark, c)
    assert(back.columns.toSeq == Seq("id", "values", "metadata"))
    // every third row had a null category — the entry must be ABSENT
    val m = back.filter(col("id") === "3")
      .select("metadata").head.getMap[String, String](0)
    assert(!m.contains("category") && m("title") == "title 3")
    InMemoryVdbServer.drop(c)
  }

  test("pinecone pod placement requires an environment") {
    intercept[IllegalArgumentException] {
      AdapterVdb.pineconeImport(srcDf(), "p2", ns(), serverless = false)
    }
  }

  test("chroma: hnsw:space metadata, scalar-only meta, documents from text col") {
    val mm = Map("vector" -> ModelMap(text_column = Some("title")))
    val withNullVec = srcDf().union(
      srcDf(1).select(lit(99L).as("id"),
        lit(null).cast(ArrayType(FloatType)).as("vector"),
        lit("t").as("title"), lit("c").as("category"), lit(0.0).as("score")))
    val c = AdapterVdb.chromaImport(withNullVec, "ch", ns(modelMap = Some(mm)))
    val spec = InMemoryVdbServer.specOf(c).get.asInstanceOf[ChromaCollectionSpec]
    assert(spec.metadata == Map("hnsw:space" -> "cosine"))
    val back = AdapterVdb.read(spark, c)
    assert(back.count() == 20) // null-vector row dropped
    assert(back.filter(col("id") === "5")
      .select("document").head.getString(0) == "title 5")
    InMemoryVdbServer.drop(c)
  }

  test("lancedb: schema drift widens the table and backfills defaults") {
    val first = srcDf().select("id", "vector", "title")
    val c = AdapterVdb.lancedbImport(first, "lt", ns())
    // second batch brings a NEW column and LACKS an existing one
    val second = srcDf(5).select(
      (col("id") + 100).as("id"), col("vector"), col("score"))
    AdapterVdb.lancedbImport(second, "lt", ns())
    // the drift decision is the recorded spec
    val added = InMemoryVdbServer.specOf(c).get.asInstanceOf[Seq[(String, Any)]]
    assert(added == Seq("score" -> 0.0))
    val back = AdapterVdb.read(spark, c)
    assert(back.columns.sorted.toSeq == Seq("id", "score", "title", "vector"))
    // old rows got the double default, new rows the string default
    assert(back.filter(col("id") === 1).select("score").head.getDouble(0) == 0.0)
    assert(back.filter(col("id") === 101).select("title").head.getString(0) == "")
    assert(back.count() == 25)
    InMemoryVdbServer.drop(c)
  }

  test("astradb: JSON-API spec + CQL DDL twin, $vector column") {
    val c = AdapterVdb.astraImport(srcDf(), "as", ns(metric = Some("Dot")),
      keyspace = "ks1")
    val (spec, cql) = InMemoryVdbServer.specOf(c).get
      .asInstanceOf[(AstraCollectionSpec, String)]
    assert(spec == AstraCollectionSpec("as", 4, "dot_product"))
    assert(cql.contains("ks1.as") && cql.contains("vector<float,4>"))
    assert(InMemoryVdbServer.schemaOf(c).fieldNames.contains("$vector"))
    assert(AdapterVdb.read(spark, c).count() == 20)
    InMemoryVdbServer.drop(c)
  }

  test("kdbai: pytype schema, vectorIndex head, non-chosen vectors dropped") {
    val df = srcDf().withColumn("alt-vec",
      expr("transform(vector, x -> x + 1.0f)"))
    val c = AdapterVdb.kdbaiImport(df, "kt",
      ns(vectorColumns = List("vector", "alt-vec")), indexType = "HNSW")
    val spec = InMemoryVdbServer.specOf(c).get.asInstanceOf[KdbaiTableSpec]
    assert(spec.columns.head ==
      KdbaiColumn("vector", vectorIndex = Some(KdbaiVectorIndex(4, "CS", "hnsw"))))
    assert(spec.droppedColumns == Seq("alt_vec"))
    assert(spec.columns.exists(cl => cl.name == "title" && cl.pytype == Some("str")))
    assert(spec.columns.exists(cl => cl.name == "score" && cl.pytype == Some("float64")))
    val back = AdapterVdb.read(spark, c)
    assert(!back.columns.contains("alt_vec") && back.count() == 20)
    InMemoryVdbServer.drop(c)
  }

  test("vertexai: live-collision naming, datapoint shaping, upsert last-wins") {
    val r = Seq(VertexRestrict("category", allowCols = Seq("category")))
    val c = AdapterVdb.vertexImport(srcDf(), "vx", ns(namespace = "p"),
      restricts = r, crowdingTagCol = Some("title"))
    assert(c == "vx_p")
    val spec = InMemoryVdbServer.specOf(c).get.asInstanceOf[VertexIndexSpec]
    assert(spec.dimensions == 4 &&
      spec.distanceMeasureType == "DOT_PRODUCT_DISTANCE")
    val back = AdapterVdb.read(spark, c)
    assert(back.columns.toSeq == Seq("datapoint_id", "feature_vector",
      "restricts", "numeric_restricts", "crowding_tag"))
    // createNew against the LIVE service suffixes cumulatively
    val c2 = AdapterVdb.vertexImport(srcDf(), "vx", ns(namespace = "p"),
      createNew = true)
    assert(c2 == "vx_p_2")
    // same ids upserted to the FIRST index last-wins: count unchanged
    AdapterVdb.vertexImport(srcDf(), "vx", ns(namespace = "p"))
    assert(InMemoryVdbServer.count(c) == 20)
    InMemoryVdbServer.drop(c); InMemoryVdbServer.drop(c2)
  }

  test("vespa: visit-chain scan feeds the DSv2 write; feed-URL spec at the boundary") {
    // fake two-page visit service: executors walk the continuation
    // chain (None → "AAA" → end), exactly the reference's visit loop
    val outSchema = StructType(Seq(StructField("id", StringType),
      StructField("title", StringType)))
    val scanned = Adapters.Vespa.scan(spark, outSchema, Seq("prod")) {
      (_, tok) => tok match {
        case None => VespaVisitPage("path",
          (0 until 3).map(i => VespaDoc(s"d$i", Map("title" -> s"t$i"))),
          3, Some("AAA"))
        case Some("AAA") => VespaVisitPage("path",
          Seq(VespaDoc("d3", Map("title" -> "t3"))), 1, None)
        case other => throw new IllegalStateException(
          s"unexpected continuation $other")
      }
    }
    val c = AdapterVdb.vespaImport(scanned, "http://host:8080/", "prod")
    assert(c == "prod")
    // boundary spec = the id-addressed PUT-URL template a feed client uses
    val spec = InMemoryVdbServer.specOf(c).get.asInstanceOf[String]
    assert(spec == "http://host:8080/document/v1/prod/prod/docid/{id}")
    val back = AdapterVdb.read(spark, c)
    assert(back.count() == 4)
    assert(back.filter(col("id") === "d3")
      .select("title").head.getString(0) == "t3")
    // pruned read reaches the service
    val plan = back.select("id").queryExecution.executedPlan.toString
    assert(plan.contains("columns=id"))
    InMemoryVdbServer.drop(c)
  }

  test("weaviate: UpperCamel class, BYO-vector + metric bimap at the boundary") {
    val c = AdapterVdb.weaviateImport(srcDf(), "art-icle",
      ns(namespace = "en", metric = Some("Euclid")))
    assert(c == "Art-icle_en")
    val spec = InMemoryVdbServer.specOf(c).get.asInstanceOf[WeaviateClassSpec]
    assert(spec.vectorizer == "none" && spec.distance == "l2-squared")
    val back = AdapterVdb.read(spark, c)
    assert(back.columns.toSeq ==
      Seq("id", "vector", "title", "category", "score"))
    assert(back.count() == 20)
    // same ids upserted again: last-wins, count unchanged
    AdapterVdb.weaviateImport(srcDf(), "art-icle",
      ns(namespace = "en", metric = Some("Euclid")))
    assert(InMemoryVdbServer.count(c) == 20)
    InMemoryVdbServer.drop(c)
  }

  test("write boundary rejects a frame that doesn't match the collection DDL") {
    import spark.implicits._
    val c = AdapterVdb.qdrantImport(srcDf(), "strict", ns())
    val bad = Seq(("a", 1L)).toDF("id", "wrong")
    val e = intercept[Exception] {
      bad.write.format(AdapterVdb.Format).option("index", c)
        .mode("append").save()
    }
    assert(e.getMessage.contains("does not match"))
    InMemoryVdbServer.drop(c)
  }
}
