package graft.core

import org.scalatest.funsuite.AnyFunSuite

class VdfMetaSpec extends AnyFunSuite {

  private val ns = NamespaceMeta(
    namespace = "",
    index_name = "idx1",
    total_vector_count = 1000L,
    exported_vector_count = 1000L,
    dimensions = 8,
    model_name = Some("test-model"),
    vector_columns = List("vector"),
    data_path = "idx1",
    metric = Some("Cosine"),
    model_map = Some(Map("vector" -> ModelMap(
      Some("test-model"), Some("title"), Some(8), Some("vector")))),
    index_config = Some(Map("hnsw_config" -> Map("m" -> 16))))

  private val meta = VdfMeta(
    version = "0.1.247",
    file_structure = List("idx1/1.parquet", "VDF_META.json"),
    author = "test",
    exported_from = "mock",
    indexes = Map("idx1" -> List(ns)),
    exported_at = "2026-01-01T00:00:00Z",
    id_column = Some("id"))

  test("JSON round trip preserves all modeled fields") {
    val back = VdfMeta.fromJson(VdfMeta.toJson(meta))
    assert(back.version == meta.version)
    assert(back.file_structure == meta.file_structure)
    assert(back.id_column.contains("id"))
    val n = back.indexes("idx1").head
    assert(n.index_name == "idx1")
    assert(n.dimensions == 8)
    assert(n.metric.contains("Cosine"))
    assert(n.model_map.get("vector").model_name.contains("test-model"))
    assert(n.index_config.isDefined)
  }

  test("id_column defaults to None like the reference (meta_types.py:29)") {
    val m = VdfMeta.fromJson("""{"version":"1.0"}""")
    assert(m.id_column.isEmpty)
    assert(m.idColumnOrDefault == Constants.IdColumn)
  }

  test("index_config deserializes from externally produced JSON") {
    val json =
      """{"version":"1.0","indexes":{"i":[{"index_name":"i","dimensions":4,
        |"index_config":{"hnsw":{"m":16,"ef":200},"on_disk":true}}]}}""".stripMargin
    val m = VdfMeta.fromJson(json)
    val cfg = m.indexes("i").head.index_config
    assert(cfg.isDefined)
    assert(cfg.get.contains("hnsw"))
    assert(cfg.get("on_disk") == true)
  }

  test("unknown fields survive a read→rewrite round trip") {
    val json =
      """{"version":"1.0","custom_tool_field":"keepme",
        |"indexes":{"i":[{"index_name":"i","dimensions":4,
        |"future_ns_field":[1,2,3]}]}}""".stripMargin
    val m = VdfMeta.fromJson(json)
    assert(m.unknownFields.get("custom_tool_field").contains("keepme"))
    val rewritten = VdfMeta.toJson(m)
    assert(rewritten.contains("custom_tool_field"))
    assert(rewritten.contains("keepme"))
    assert(rewritten.contains("future_ns_field"))
  }

  test("file write/read round trip") {
    val dir = java.nio.file.Files.createTempDirectory("vdfmeta").toString
    VdfMeta.write(meta, dir)
    assert(VdfMeta.exists(dir))
    val back = VdfMeta.read(dir)
    assert(back.indexes.keySet == Set("idx1"))
  }

  test("golden interop: the reference's canonical VDF_META.json parses verbatim and round-trips deep-equal") {
    // the untouched bytes of the reference's own example manifest
    // (vector-io `archive/example-VDF_META.json:1-27`, copied verbatim
    // into test resources) — a user's first real action is pointing
    // this engine at a VDF directory the Python tool wrote, so the
    // manifest shape oracle is parsed AS SHIPPED, not as re-built
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/example-VDF_META.json"),
      "UTF-8").mkString
    val m = VdfMeta.fromJson(raw)
    // every top-level field, value for value
    assert(m.version == "0.0.4")
    assert(m.file_structure == List(
      "vdf_20240122_135409_c5fa3/i1.parquet/1.parquet",
      "vdf_20240122_135409_c5fa3/VDF_META.json"))
    assert(m.author == "dhruvanand")
    assert(m.exported_from == "pinecone")
    assert(m.exported_at == "2024-01-22T13:54:25.649727+05:30")
    assert(m.id_column.isEmpty) // absent in the example → reference default
    assert(m.idColumnOrDefault == Constants.IdColumn)
    assert(m.unknownFields.isEmpty) // the model declares everything shipped
    // the one index → one namespace, every per-namespace field
    assert(m.indexes.keySet == Set("wikipedia-1k-cohere-openai-embeddings"))
    val ns = m.indexes("wikipedia-1k-cohere-openai-embeddings") match {
      case one :: Nil => one
      case other => fail(s"expected exactly one namespace, got $other")
    }
    assert(ns.namespace == "")
    assert(ns.total_vector_count == 1000L)
    assert(ns.exported_vector_count == 1000L)
    assert(ns.dimensions == 768)
    assert(ns.model_name.contains("cohere/embed-multilingual-v2.0"))
    assert(ns.vector_columns == List("vector"))
    assert(ns.data_path == "i1.parquet")
    assert(ns.metric.contains("Cosine"))
    assert(ns.model_map.isEmpty && ns.schema_dict_str.isEmpty
      && ns.index_config.isEmpty)
    // index_name is NOT a key in the example (the reference keys it by
    // the indexes map) — the model's default must not invent one
    assert(ns.index_name == "")
    assert(ns.unknownFields.isEmpty)
    // write → read round trip is DEEP-equal to the verbatim parse,
    // including a re-parse of our own serialization
    val dir = java.nio.file.Files.createTempDirectory("vdf-golden").toString
    VdfMeta.write(m, dir)
    val back = VdfMeta.read(dir)
    assert(back == m)
    assert(back.indexes == m.indexes)
    assert(VdfMeta.fromJson(VdfMeta.toJson(back)) == m)
    // and a foreign field injected into the SAME golden bytes survives
    // the round trip (unknown-field retention on the real shape)
    val withExtra = raw.replaceFirst(
      "\"author\"", "\"x_custom_tool\": {\"v\": 7},\n  \"author\"")
    val m2 = VdfMeta.fromJson(withExtra)
    assert(m2.unknownFields.keySet == Set("x_custom_tool"))
    val dir2 = java.nio.file.Files.createTempDirectory("vdf-golden2").toString
    VdfMeta.write(m2, dir2)
    assert(VdfMeta.read(dir2).unknownFields.keySet == Set("x_custom_tool"))
  }

  test("metric bimaps normalize and reverse (util.py:159-248)") {
    assert(Metric.standardize("pinecone", "dotproduct") == Metric.Dot)
    assert(Metric.standardize("milvus", "L2") == Metric.Euclid)
    assert(Metric.standardize("qdrant", "Manhattan") == Metric.Manhattan)
    // unknown → Cosine fallback like the reference
    assert(Metric.standardize("nope", "nope") == Metric.Cosine)
    assert(Metric.toDbName("milvus", Metric.Euclid).contains("L2"))
    assert(Metric.toDbName("pinecone", Metric.Manhattan).isEmpty)
  }
}
