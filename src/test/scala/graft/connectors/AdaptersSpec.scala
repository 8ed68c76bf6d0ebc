package graft.connectors

import graft.core.NamespaceMeta
import org.scalatest.funsuite.AnyFunSuite

/** Offline fixtures for the per-connector semantics adapters, shaped
  * after the reference's own structures (qdrant_import.py:178-250,
  * milvus_import.py:92-146, archive/example-VDF_META.json). */
class AdaptersSpec extends AnyFunSuite {

  private val qdrantIndexConfig: Map[String, Any] = Map(
    "params" -> Map(
      "vectors" -> Map("size" -> 384, "distance" -> "Cosine",
        "on_disk" -> true)),
    "hnsw_config" -> Map("m" -> 16, "ef_construct" -> 100),
    "optimizers_config" -> Map("default_segment_number" -> 2),
    "wal_config" -> Map("wal_capacity_mb" -> 32),
    "quantization_config" -> Map(
      "scalar" -> Map("type" -> "int8", "always_ram" -> true)),
    "on_disk_payload" -> true,
    "sparse_vectors_config" -> Map(
      "text-sparse" -> Map("index" -> Map("on_disk" -> false))))

  private def ns(dims: Int, metric: Option[String],
      cfg: Option[Map[String, Any]], namespace: String = "") =
    NamespaceMeta(namespace = namespace, index_name = "idx",
      dimensions = dims, metric = metric, index_config = cfg)

  test("nested() walks maps and treats non-map intermediates as absent") {
    assert(Adapters.nested(Some(qdrantIndexConfig),
      Seq("params", "vectors", "size")).contains(384))
    assert(Adapters.nested(Some(qdrantIndexConfig),
      Seq("params", "vectors", "missing")).isEmpty)
    assert(Adapters.nested(Some(qdrantIndexConfig),
      Seq("on_disk_payload", "deeper")).isEmpty)
    assert(Adapters.nested(None, Seq("params")).isEmpty)
  }

  test("qdrant collection spec: full index_config passthrough + named vectors") {
    val spec = Adapters.Qdrant.collectionSpec("docs",
      ns(-1, Some("Dot"), Some(qdrantIndexConfig), namespace = "prod"),
      Seq("vec_a", "vec_b"))
    assert(spec.collectionName == "docs_prod")
    // dims resolved from index_config.params.vectors.size (manifest -1)
    assert(spec.vectorsConfig.keySet == Set("vec_a", "vec_b"))
    assert(spec.vectorsConfig("vec_a") ==
      Adapters.QdrantVectorParams(384, "Dot", Some(true)))
    assert(spec.sparseVectorsConfig.contains(
      qdrantIndexConfig("sparse_vectors_config")))
    assert(spec.hnswConfig.contains(qdrantIndexConfig("hnsw_config")))
    assert(spec.optimizersConfig.contains(qdrantIndexConfig("optimizers_config")))
    assert(spec.walConfig.contains(qdrantIndexConfig("wal_config")))
    assert(spec.quantizationConfig.contains(qdrantIndexConfig("quantization_config")))
    assert(spec.onDiskPayload.contains(true))
  }

  test("qdrant defaults: Cosine metric, no config sections, manifest dims") {
    val spec = Adapters.Qdrant.collectionSpec("docs",
      ns(128, None, None), Seq("vector"))
    assert(spec.collectionName == "docs")
    assert(spec.vectorsConfig("vector") ==
      Adapters.QdrantVectorParams(128, "Cosine", None))
    assert(spec.sparseVectorsConfig.isEmpty && spec.hnswConfig.isEmpty &&
      spec.quantizationConfig.isEmpty && spec.onDiskPayload.isEmpty)
  }

  test("qdrant dims: unresolvable dims raise like the reference") {
    intercept[IllegalArgumentException] {
      Adapters.Qdrant.collectionSpec("docs", ns(-1, None, None), Seq("v"))
    }
  }

  test("milvus collection spec: VARCHAR pk, dynamic fields, '-' renames") {
    val spec = Adapters.Milvus.collectionSpec("my-index",
      ns(256, Some("Euclid"), None, namespace = "n-s"), "id", "text-embedding")
    assert(spec.collectionName == "my_index_n_s")
    assert(spec.pkField == "id" && spec.pkMaxLength == 65535)
    assert(spec.vectorField == "text_embedding")
    assert(spec.dim == 256)
    assert(spec.enableDynamicField)
  }

  test("milvus index spec: reverse-metric AUTOINDEX") {
    assert(Adapters.Milvus.indexSpec(ns(8, Some("Euclid"), None)) ==
      Adapters.MilvusIndexSpec("L2", "AUTOINDEX"))
    assert(Adapters.Milvus.indexSpec(ns(8, Some("Dot"), None)) ==
      Adapters.MilvusIndexSpec("IP", "AUTOINDEX"))
    assert(Adapters.Milvus.indexSpec(ns(8, None, None)) ==
      Adapters.MilvusIndexSpec("COSINE", "AUTOINDEX"))
    // unknown metric name falls back to the Cosine default
    assert(Adapters.Milvus.indexSpec(ns(8, Some("weird"), None)) ==
      Adapters.MilvusIndexSpec("COSINE", "AUTOINDEX"))
  }

  test("pinecone index spec: compliant name, metric reverse, placements") {
    val sv = Adapters.Pinecone.indexSpec("My_Index",
      ns(1536, Some("Dot"), None), serverless = true)
    assert(sv.name == "my-index")
    assert(sv.dimension == 1536)
    assert(sv.metric == "dotproduct")
    assert(sv.placement == Adapters.PineconeServerless("aws", "us-west-2"))
    val pod = Adapters.Pinecone.indexSpec("idx",
      ns(8, Some("Euclid"), None), serverless = false,
      environment = Some("us-east1-gcp"))
    assert(pod.metric == "euclidean")
    assert(pod.placement == Adapters.PineconePod("us-east1-gcp", "starter"))
    // pod placement without an environment is the reference's
    // interactive prompt — headless, that's an error
    intercept[IllegalArgumentException] {
      Adapters.Pinecone.indexSpec("idx", ns(8, None, None), serverless = false)
    }
  }

  test("chroma collection spec: hnsw:space metadata + single vector column") {
    val spec = Adapters.Chroma.collectionSpec("docs",
      ns(384, Some("Euclid"), None, namespace = "train"))
    assert(spec.name == "docs_train")
    assert(spec.metadata == Map("hnsw:space" -> "l2"))
    // missing metric defaults to cosine, like chroma_export.py:173-176
    assert(Adapters.Chroma.collectionSpec("d", ns(8, None, None))
      .metadata("hnsw:space") == "cosine")
    assert(Adapters.Chroma.vectorColumn(Seq("a", "b", "c")) ==
      (("a", Seq("b", "c"))))
  }

  test("chroma documents column follows the model_map text column") {
    val withMap = ns(8, None, None).copy(model_map = Some(Map(
      "emb" -> graft.core.ModelMap(text_column = Some("body")))))
    assert(Adapters.Chroma.documentsColumn(withMap, "emb").contains("body"))
    assert(Adapters.Chroma.documentsColumn(withMap, "other").isEmpty)
    assert(Adapters.Chroma.documentsColumn(ns(8, None, None), "emb").isEmpty)
  }

  test("lancedb missing-column defaults are keyed by type") {
    import org.apache.spark.sql.types._
    val incoming = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("ok", BooleanType),
      StructField("ts", TimestampType)))
    val defaults = Adapters.LanceDb.missingColumnDefaults(incoming, Set("id"))
    assert(defaults.toMap == Map(
      "name" -> "", "score" -> 0.0, "ok" -> false, "ts" -> null))
  }

  test("astra collection spec + CQL DDL") {
    val spec = Adapters.Astra.collectionSpec("users",
      ns(3, Some("Euclid"), None))
    assert(spec == Adapters.AstraCollectionSpec("users", 3, "euclidean"))
    assert(Adapters.Astra.createTableCql("default_keyspace", spec) ==
      "CREATE TABLE IF NOT EXISTS default_keyspace.users" +
        " (id text PRIMARY KEY, \"$vector\" vector<float,3>)")
  }

  test("kdbai compliant names, pytypes, and table schema synthesis") {
    // kdbai_import.py:78-83
    assert(Adapters.KdbAi.compliantName("my-col") == "my_col")
    assert(Adapters.KdbAi.compliantName("_hidden") == "col_hidden")
    // kdbai_import.py:177-182
    assert(Adapters.KdbAi.pytype("string") == "str")
    assert(Adapters.KdbAi.pytype("double") == "float64")
    assert(Adapters.KdbAi.pytype("int64") == "int64")
    // kdbai_import.py:150-175: chosen vector leads with its index
    // config; other vector columns are dropped; scalars carry pytypes
    val spec = Adapters.KdbAi.tableSpec(
      ns(4, Some("Euclid"), None), indexType = "FLAT",
      parquetColumns = Seq(("doc-id", "int64"), ("text", "string"),
        ("emb", "double"), ("emb2", "double")),
      vectorColumns = Seq("emb", "emb2"), vectorColumn = "emb")
    assert(spec.columns.head == Adapters.KdbaiColumn("emb",
      vectorIndex = Some(Adapters.KdbaiVectorIndex(4, "L2", "flat"))))
    assert(spec.columns.tail == Seq(
      Adapters.KdbaiColumn("doc_id", pytype = Some("int64")),
      Adapters.KdbaiColumn("text", pytype = Some("str"))))
    assert(spec.droppedColumns == Seq("emb2"))
  }

  test("vertexai index naming: namespace suffix + cumulative collision suffixes") {
    // vertexai_vector_search_import.py:300-310
    assert(Adapters.VertexAi.indexName("idx", "ns1", Set.empty,
      createNew = false) == "idx_ns1")
    assert(Adapters.VertexAi.indexName("idx", "", Set("idx", "idx_2"),
      createNew = true) == "idx_2_3")
    val spec = Adapters.VertexAi.indexSpec("idx", ns(8, Some("Cosine"), None))
    assert(spec.dimensions == 8 && spec.approximateNeighborsCount == 150 &&
      spec.leafNodeEmbeddingCount == 1000 &&
      spec.leafNodesToSearchPercent == 7 &&
      spec.distanceMeasureType == "DOT_PRODUCT_DISTANCE" &&
      spec.shardSize == "SHARD_SIZE_MEDIUM")
  }

  // --------------------------------------------------- Vespa (r4 ask #8)

  test("vespa visitUrl: doubled schema path, stream always kept, " +
      "continuation only when non-empty, slashes stripped both ends") {
    assert(Adapters.Vespa.visitUrl("http://h:8080/", "prod", stream = true, None)
      == "http://h:8080/document/v1/prod/prod/docid?stream=true")
    // python str(False).lower() is "false" — non-empty, so the
    // reference's `if value` filter KEEPS it
    assert(Adapters.Vespa.visitUrl("http://h:8080", "prod", stream = false, None)
      == "http://h:8080/document/v1/prod/prod/docid?stream=false")
    assert(Adapters.Vespa.visitUrl("http://h:8080", "s", stream = true, Some("AAA"))
      == "http://h:8080/document/v1/s/s/docid?stream=true&continuation=AAA")
    // empty token == absent (the reference's falsy filter)
    assert(Adapters.Vespa.visitUrl("http://h:8080", "s", stream = true, Some(""))
      == "http://h:8080/document/v1/s/s/docid?stream=true")
  }

  test("vespa feedUrl addresses one document id") {
    assert(Adapters.Vespa.feedUrl("http://h:8080/", "prod", "doc-7")
      == "http://h:8080/document/v1/prod/prod/docid/doc-7")
  }

  test("weaviate selectClasses: instance order kept, missing reported") {
    val all = Seq("Products", "Articles", "Users")
    assert(Adapters.Weaviate.selectClasses(all, None) == (all, Set.empty))
    // request order does NOT override instance order; unknown reported
    val (kept, missing) =
      Adapters.Weaviate.selectClasses(all, Some("Users,Products,Ghost"))
    assert(kept == Seq("Products", "Users"))
    assert(missing == Set("Ghost"))
  }

  test("weaviate classSpec: UpperCamel name, BYO vectors, distance bimap") {
    val spec = Adapters.Weaviate.classSpec("articles",
      ns(128, Some("Euclid"), None, namespace = "en"))
    assert(spec == Adapters.WeaviateClassSpec("Articles_en", "none", "l2-squared"))
  }
}
